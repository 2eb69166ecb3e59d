"""Zoom-partitioned table IO with per-level manifests (checkpoint/resume).

"Iceberg" as an interface (SURVEY.md §7 g6): when an Iceberg catalog is
configured the same calls go through ``spark.table``/``writeTo``; in this
sandbox (no Iceberg runtime jar) the backend is parquet partitioned by
``zoom=<z>`` plus a JSON manifest per level carrying what the north rule
asks for: input lineage, per-partition row counts, and status — so a
killed pyramid build resumes from the last complete zoom.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class TableIO:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "_manifest"), exist_ok=True)

    # -- paths ---------------------------------------------------------------
    def level_path(self, zoom: int) -> str:
        return os.path.join(self.root, f"zoom={zoom}")

    def manifest_path(self, zoom: int) -> str:
        return os.path.join(self.root, "_manifest", f"z{zoom}.json")

    # -- write ---------------------------------------------------------------
    def write_level(self, df: DataFrame, zoom: int, lineage: dict | None = None,
                    partition_cols: int | None = None) -> dict:
        """Write one pyramid level; manifest committed AFTER a successful
        write (write-then-commit, so a crash mid-write leaves an incomplete
        level that resume re-runs)."""
        path = self.level_path(zoom)
        out = df.drop("zoom") if "zoom" in df.columns else df
        out.write.mode("overwrite").parquet(path)

        spark = df.sparkSession
        written = spark.read.parquet(path)
        per_file = (
            written.groupBy(F.input_file_name().alias("file"))
            .count()
            .collect()
        )
        manifest = {
            "zoom": zoom,
            "status": "complete",
            "row_count": int(sum(r["count"] for r in per_file)),
            "files": {os.path.basename(r["file"]): int(r["count"]) for r in per_file},
            "lineage": lineage or {},
            "completed_at": time.time(),
        }
        tmp = self.manifest_path(zoom) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, self.manifest_path(zoom))
        return manifest

    # -- read / resume ---------------------------------------------------------
    def level_complete(self, zoom: int) -> bool:
        p = self.manifest_path(zoom)
        if not os.path.exists(p):
            return False
        with open(p) as f:
            return json.load(f).get("status") == "complete"

    def read_level(self, spark: SparkSession, zoom: int) -> DataFrame:
        return spark.read.parquet(self.level_path(zoom)).withColumn("zoom", F.lit(zoom))

    def read_manifest(self, zoom: int) -> dict:
        with open(self.manifest_path(zoom)) as f:
            return json.load(f)
