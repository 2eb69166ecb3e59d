"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The decode step is STUBBED (no image/audio libs in this container — a
clearly-marked NotImplementedError / deterministic fake), but the Spark
plumbing is real and tested: binary columns flow through Arrow into
mapInPandas batches, feature extraction is vectorized per batch, schemas
are typed structs, and partitioning survives the pass (narrow
transformation, no shuffle).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame


def decode_image(data: bytes) -> "object":
    """Real image decode needs PIL/libjpeg — not in this container."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "environment; use fake_decode_features for deterministic testing")


def fake_decode_features(data: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for (width, height, channels): derived from
    the byte content so tests are stable and collisions meaningful."""
    n = len(data)
    return (n % 640 + 1, (n * 7) % 480 + 1, 3)


HTML_FEATURES_SCHEMA = (
    "url string, n_bytes long, n_tags long, text_extracted string, fake_w int, fake_h int"
)


def html_features(df: DataFrame, html_col: str = "html",
                  url_col: str = "url") -> DataFrame:
    """mapInPandas feature extraction over a binary column.

    Real parts: byte length, tag count, tag-stripped text (byte-identical
    extraction — the north_rule invariant).  Fake parts: image-like
    dimensions from fake_decode_features, standing in for decode."""

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        tag_re = r"<[^>]+>"
        for pdf in batches:
            # vectorized pandas string kernels over the whole Arrow batch —
            # no per-row Python loop (north_rule); .str.len()/.str.decode()
            # operate on the bytes series directly
            n_bytes = pdf[html_col].str.len().astype("int64")
            s = pdf[html_col].str.decode("utf-8", errors="replace")
            n_tags = s.str.count(tag_re)
            texts = s.str.replace(tag_re, "", regex=True)
            yield pd.DataFrame({
                "url": pdf[url_col],
                "n_bytes": n_bytes,
                "n_tags": n_tags,
                "text_extracted": texts,
                "fake_w": (n_bytes % 640 + 1).astype("int32"),
                "fake_h": ((n_bytes * 7) % 480 + 1).astype("int32"),
            })

    return df.mapInPandas(gen, schema=HTML_FEATURES_SCHEMA)
