"""dist/posextract_spark.zip freshness guard.

The north rule's deployment path is ``spark-submit --py-files
dist/posextract_spark.zip``; a stale zip ships last round's code to the
executors while the driver runs this round's — the worst kind of skew
(it surfaces as pickle/attribute errors at best, silently divergent
results at worst). The zip went stale once (rebuilt in r3, not after
the r4 operator rewrites); this pins every packaged .py byte-identical
to the working tree.
"""

import os
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pyfiles_zip_matches_working_tree():
    zpath = os.path.join(REPO, "dist", "posextract_spark.zip")
    if not os.path.exists(zpath):
        # dist/ is an untracked build artifact — absent on a fresh clone
        # is fine; PRESENT but stale is the deployment hazard.
        pytest.skip("dist zip not built (run tools/make_pyfiles.py before spark-submit)")
    with zipfile.ZipFile(zpath) as zf:
        names = set(zf.namelist())
        stale, missing = [], []
        tree = set()
        # every tracked source file must be in the zip with identical bytes
        for dirpath, _, filenames in os.walk(os.path.join(REPO, "posextract_spark")):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                arc = os.path.relpath(full, REPO)
                tree.add(arc)
                if arc not in names:
                    missing.append(arc)
                elif zf.read(arc) != open(full, "rb").read():
                    stale.append(arc)
        # ...and the reverse: a module deleted/renamed in the tree but still
        # packaged would stay importable on executors only — the same skew
        ghosts = sorted(
            n for n in names if n.endswith(".py") and n.startswith("posextract_spark/") and n not in tree
        )
    assert not missing, f"not in zip (run tools/make_pyfiles.py): {missing}"
    assert not stale, f"zip content stale (run tools/make_pyfiles.py): {stale}"
    assert not ghosts, f"zip ships modules absent from the tree: {ghosts}"
