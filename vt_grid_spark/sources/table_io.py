"""Zoom-partitioned table IO with per-level manifests (checkpoint/resume).

"Iceberg" as an interface (SURVEY.md §7 g6): this class IS the seam — the
pyramid driver only calls ``write_level`` / ``read_level`` /
``level_complete`` / ``read_manifest``.  The backend shipped here is
parquet partitioned by ``zoom=<z>`` plus a JSON manifest per level
carrying what the north rule asks for: input lineage, per-partition row
counts, and status — so a killed pyramid build resumes from the last
complete zoom.  A catalog-backed variant (``df.writeTo(table)`` /
``spark.table`` + snapshot-id lineage) would subclass and override those
four methods; it is NOT shipped because no Iceberg runtime jar exists in
this environment to test it against.
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

        # per-partition row counts from parquet FOOTERS (driver-side pyarrow
        # metadata read, no Spark job) — a read-back count job per level was
        # the dominant fixed cost of the build at small level sizes
        import pyarrow.parquet as pq

        files = {}
        for name in sorted(os.listdir(path)):
            if name.endswith(".parquet"):
                files[name] = pq.read_metadata(os.path.join(path, name)).num_rows
        manifest = {
            "zoom": zoom,
            "status": "complete",
            "row_count": int(sum(files.values())),
            "files": files,
            "lineage": lineage or {},
            "completed_at": time.time(),
        }
        tmp = self.manifest_path(zoom) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, self.manifest_path(zoom))
        return manifest

    def amend_manifest(self, zoom: int, **extra) -> dict:
        """Merge extra keys into an existing manifest (same atomic
        write-then-replace as the original commit)."""
        m = self.read_manifest(zoom)
        m.update(extra)
        tmp = self.manifest_path(zoom) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1, sort_keys=True)
        os.replace(tmp, self.manifest_path(zoom))
        return m

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

    # -- driver-side (pandas) path for tiny upper levels ------------------------
    def read_level_pandas(self, zoom: int):
        import pandas as pd
        import pyarrow.parquet as pq

        path = self.level_path(zoom)
        tbl = pq.read_table(path)
        pdf = tbl.to_pandas()
        pdf.insert(0, "zoom", zoom)
        return pdf

    def write_level_pandas(self, pdf, zoom: int, lineage: dict | None = None) -> dict:
        import pyarrow.parquet as pq
        import pyarrow as pa

        path = self.level_path(zoom)
        if os.path.exists(path):  # overwrite semantics, same as the Spark path
            import shutil
            shutil.rmtree(path)
        os.makedirs(path)
        fname = "part-00000.parquet"
        out = pdf.drop(columns=["zoom"]) if "zoom" in pdf.columns else pdf
        pq.write_table(pa.Table.from_pandas(out, preserve_index=False),
                       os.path.join(path, fname))
        manifest = {
            "zoom": zoom,
            "status": "complete",
            "row_count": int(len(out)),
            "files": {fname: int(len(out))},
            "lineage": lineage or {},
            "completed_at": time.time(),
        }
        tmp = self.manifest_path(zoom) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, self.manifest_path(zoom))
        return manifest
