"""spark-submit packaging: the zip built by scripts/package.sh must be a
complete, importable py-files artifact."""

import subprocess
import sys
import zipfile


def test_zip_contains_full_package(tmp_path):
    subprocess.run(["bash", "scripts/package.sh"], check=True,
                   capture_output=True)
    names = set(zipfile.ZipFile("dist/remine_spark.zip").namelist())
    for mod in ("remine_spark/pipeline.py", "remine_spark/__main__.py",
                "remine_spark/operators/dedup.py",
                "remine_spark/streaming/kg_update.py",
                "remine_spark/classifier.py"):
        assert mod in names, mod


def test_zip_importable_standalone(tmp_path):
    """Import the package from the zip alone (what --py-files does)."""
    subprocess.run(["bash", "scripts/package.sh"], check=True,
                   capture_output=True)
    code = (
        "import sys; sys.path.insert(0, 'dist/remine_spark.zip');"
        "import remine_spark.algo, remine_spark.nlp;"
        "print(remine_spark.nlp.pos_tag(['acme','acquired','globex']))"
    )
    out = subprocess.run([sys.executable, "-c", code], check=True,
                         capture_output=True, text=True)
    assert "NNP" in out.stdout and "VBD" in out.stdout
