"""The north-rule launch surface: `spark-submit --py-files` must run the
packaged pipeline end-to-end (synth -> run -> resume-from-checkpoint),
with the library imported ONLY from dist/remine_spark.zip."""

import shutil
import subprocess

SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _submit(*args):
    cmd = [
        SUBMIT, "--master", "local[4]",
        "--py-files", "dist/remine_spark.zip",
        "scripts/submit_main.py", *args,
    ]
    return subprocess.run(cmd, capture_output=True, text=True, timeout=300)


def _triples(proc):
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith("triples=")][0]
    return int(line.split("=", 1)[1].split()[0])


def test_spark_submit_pipeline_and_resume(tmp_path):
    subprocess.run(["bash", "scripts/package.sh"], check=True,
                   capture_output=True)
    pages, wd = str(tmp_path / "pages"), str(tmp_path / "wd")

    synth = _submit("synth", "--docs", "120", "--output", pages)
    assert synth.returncode == 0, synth.stderr[-2000:]

    run_args = ("run", "--input", pages, "--workdir", wd,
                "--inner-iters", "1", "--transe-epochs", "2")
    cold = _submit(*run_args)
    assert cold.returncode == 0, cold.stderr[-2000:]
    n = _triples(cold)
    assert n > 0

    # identical re-submit resumes from the stage checkpoints in wd and
    # must reproduce the exact triple count
    resumed = _submit(*run_args)
    assert resumed.returncode == 0, resumed.stderr[-2000:]
    assert _triples(resumed) == n
