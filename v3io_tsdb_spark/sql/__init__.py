"""SQL surface: v3io filter-dialect translation and the TSDB SQL parser."""
