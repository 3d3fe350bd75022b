"""The north rule ships the job via ``spark-submit --py-files
crawlspark.zip`` (launch_crawl.py documents the command). This gate
proves the package really is zip-importable and self-contained: every
module loads from the archive alone in a fresh interpreter with the
repo NOT on sys.path (no __file__-relative resources, no stray
dependencies outside the baked-in stack)."""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

def _discover_modules() -> list[str]:
    """Every module in the package, from the files on disk — a new
    operator can't silently miss the zip-import gate."""
    mods = []
    pkg_root = os.path.join(REPO, "crawlspark")
    for dirpath, _, files in os.walk(pkg_root):
        if "__pycache__" in dirpath:
            continue
        for fn in files:
            if not fn.endswith(".py"):
                continue
            rel = os.path.relpath(os.path.join(dirpath, fn), REPO)
            mod = rel[:-3].replace(os.sep, ".")
            if mod.endswith(".__init__"):
                mod = mod[: -len(".__init__")]
            mods.append(mod)
    assert len(mods) >= 40, mods  # the package should only ever grow
    return sorted(mods)


MODULES = _discover_modules()


def test_pyfiles_zip_is_self_contained(tmp_path):
    zp = str(tmp_path / "crawlspark.zip")
    with zipfile.ZipFile(zp, "w") as z:
        for dirpath, _, files in os.walk(os.path.join(REPO, "crawlspark")):
            if "__pycache__" in dirpath:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, REPO))

    imports = "; ".join(f"import {m}" for m in MODULES)
    code = (
        f"import sys; sys.path.insert(0, {zp!r}); {imports}; "
        f"import crawlspark.engine as e; "
        f"assert e.__file__.startswith({zp!r}), e.__file__; "
        "print('ZIPOK', len(sys.modules))"
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # repo dir NOT on sys.path
        env=env,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ZIPOK" in out.stdout
