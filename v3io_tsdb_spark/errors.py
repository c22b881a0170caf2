"""Engine error types (analog of the reference's typed errors)."""


class TSDBError(Exception):
    """Base error for the engine."""


class BadRequest(TSDBError):
    """Invalid query / ingest parameters.

    ref: pkg/utils/errors.go (ErrorWithStatusCode 400-style errors)
    """


class SchemaError(TSDBError):
    """Missing / malformed TSDB schema config."""
