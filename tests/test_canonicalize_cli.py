"""canonical_clusters + CLI end-to-end (subprocess) tests."""

import csv
import glob
import subprocess
import sys


def test_canonical_clusters_groups_aliases(spark):
    from posextract_spark.operators.canonicalize import canonical_clusters
    from posextract_spark.sources.pages import alias_table

    clusters = {
        r.surface_norm: r.cluster_rep for r in canonical_clusters(None, alias_table(spark)).collect()
    }
    # all acme surfaces share one representative; zorin's differ from acme's
    assert clusters["acme"] == clusters["acmecorp"] == clusters["acmeinc"]
    assert clusters["zorin"] == clusters["zorinltd"] == clusters["zorin holdings"]
    assert clusters["acme"] != clusters["zorin"]


def test_cli_triples_subprocess(tmp_path):
    inp = tmp_path / "in.csv"
    inp.write_text(
        'id,text\n1,"Acme acquired Zorin."\n2,"Acme did not acquire Zorin."\n'
    )
    out_dir = tmp_path / "out"
    res = subprocess.run(
        [
            sys.executable,
            "-m",
            "posextract_spark.cli",
            "triples",
            "--input-file",
            str(inp),
            "--data-column",
            "text",
            "--id-column",
            "id",
            "--output",
            str(out_dir),
            "--parser",
            "template",
            "--master",
            "local[2]",
        ],
        capture_output=True,
        text=True,
        timeout=280,
        cwd="/root/repo",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    rows = []
    for part in glob.glob(str(out_dir / "part-*.csv")):
        with open(part) as f:
            rows.extend(csv.DictReader(f))
    got = {(r["sentence_id"], r["subject"], r["verb"], r["object"]) for r in rows}
    assert ("1", "Acme", "acquired", "Zorin") in got
    assert ("2", "Acme", "acquire", "Zorin") in got
    neg = [r for r in rows if r["sentence_id"] == "2"]
    assert neg[0]["neg_adverb"] == "not"
