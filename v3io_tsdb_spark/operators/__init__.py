"""Operator library: aggregation, bucketing, interpolation, frames."""
