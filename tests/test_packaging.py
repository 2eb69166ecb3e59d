"""spark-submit --py-files contract: the engine must be importable from a
zip via zipimport (that is how --py-files materializes on executors).
Pure-python check, no SparkSession — catches a data file or native dep
sneaking into the package."""

import subprocess
import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_engine_imports_from_pyfiles_zip(tmp_path):
    zpath = tmp_path / "vt_grid_spark.zip"
    pkg = REPO / "vt_grid_spark"
    with zipfile.ZipFile(zpath, "w") as z:
        for f in sorted(pkg.rglob("*.py")):
            z.write(f, f.relative_to(REPO))

    probe = (
        "import sys; sys.path.insert(0, {z!r})\n"
        # keep the repo itself OFF the path: the zip must be self-sufficient
        "sys.path = [p for p in sys.path if p != {repo!r}]\n"
        "import vt_grid_spark.tilemath as tm\n"
        "import vt_grid_spark.cellindex, vt_grid_spark.plans.aggspec\n"
        "import vt_grid_spark.operators.rollup, vt_grid_spark.sources.mvt\n"
        "import numpy as np\n"
        "q = tm.tile_to_quadkey(np.array([9631]), np.array([8139]), 14)\n"
        "assert len(q[0]) == 14\n"
        "print('ZIPOK', vt_grid_spark.tilemath.__file__)\n"
    ).format(z=str(zpath), repo=str(REPO))
    out = subprocess.run([sys.executable, "-c", probe], cwd=str(tmp_path),
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert "ZIPOK" in out.stdout
    # the import really came from the zip, not a stray site install
    assert "vt_grid_spark.zip" in out.stdout
