"""Deployment-path smoke (north_rule: 'ships via spark-submit
--py-files'): zip the package, copy ONLY the launcher next to it, and
run a real crawl through ``spark-submit`` from a directory where the
repo is NOT importable — the zip must supply crawlspark."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

import pytest

from crawlspark import corpus as C

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    import pyspark

    p = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return p if os.path.exists(p) else None


@pytest.mark.slow
def test_spark_submit_py_files_crawl(tmp_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("no spark-submit on PATH")

    corpus = str(tmp_path / "corpus")
    C.write_corpus(corpus, C.CorpusSpec(n_pages=30, n_domains=5, seed=29))

    zpath = str(tmp_path / "crawlspark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "crawlspark")
        for dirpath, _, fnames in os.walk(pkg):
            for fn in fnames:
                if fn.endswith(".py"):
                    fp = os.path.join(dirpath, fn)
                    z.write(fp, os.path.relpath(fp, REPO))
    shutil.copy(os.path.join(REPO, "launch_crawl.py"), tmp_path)

    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = "4"
    env["SPARK_DRIVER_MEM"] = "4g"
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [
            submit,
            "--master", "local[4]",
            "--py-files", zpath,
            "launch_crawl.py",
            "--corpus", corpus,
            "--state", str(tmp_path / "state"),
            "--rounds", "3",
        ],
        cwd=str(tmp_path),  # repo not importable from here
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    summary = json.loads(
        [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    )
    assert summary["scheduled"] > 0 and summary["rounds"] >= 1, summary
