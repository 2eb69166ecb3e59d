"""Engine operators: encode, rollup, pyramid driver, clip/degenerate,
spatial joins, kNN, raster<->vector, dedup, similarity, text analysis."""
