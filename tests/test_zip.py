"""engine.zip freshness (ADVICE r4, medium): every spark-submit path
ships engine.zip to executors (--py-files), while the driver imports
the live tree — a stale zip silently runs OLD code executor-side.
This check fails the suite whenever the zip and the tree diverge, so
`python tools/make_zip.py` must be rerun before committing source
changes (the verify skill's standing rule, now enforced)."""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tree_sources() -> dict[str, bytes]:
    src: dict[str, bytes] = {}
    pkg = os.path.join(REPO, "search_engine_skillbox_spark")
    for root, dirs, files in os.walk(pkg):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                with open(p, "rb") as fh:
                    src[os.path.relpath(p, REPO)] = fh.read()
    return src


def test_engine_zip_matches_source_tree():
    src = _tree_sources()
    assert src, "package sources missing?"
    with zipfile.ZipFile(os.path.join(REPO, "engine.zip")) as z:
        names = set(z.namelist())
        assert names == set(src), (
            "engine.zip member set differs from the source tree — rerun "
            f"python tools/make_zip.py (only-in-zip: "
            f"{sorted(names - set(src))[:5]}, only-in-tree: "
            f"{sorted(set(src) - names)[:5]})")
        for rel, content in sorted(src.items()):
            assert z.read(rel) == content, (
                f"engine.zip is STALE for {rel} — rerun "
                "python tools/make_zip.py")
