"""Launch-path smoke: the north rule requires the job to run via
``spark-submit --py-files`` — exercise exactly that, end to end: zip the
package, submit a resumable parse on a real transcript slice with the zip on
--py-files (NOT the repo on PYTHONPATH), and check the output relation."""

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str:
    from pyspark import find_spark_home

    return os.path.join(find_spark_home._find_spark_home(), "bin", "spark-submit")


@pytest.mark.slow
def test_spark_submit_py_files_parse(tmp_path):
    submit = _spark_submit()
    if not os.path.exists(submit):
        pytest.skip("spark-submit not found")

    # package the library the way a cluster deploy would
    zip_path = tmp_path / "openparse_spark.zip"
    pkg = os.path.join(REPO, "open_parse_spark")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))

    # small deterministic input: one part file of the bench corpus
    # (regenerated via bench.py's cached generator if the gitignored
    # directory was cleaned)
    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    import bench

    bench_dir = bench._ensure_bench_transcripts()
    part = sorted(
        f for f in os.listdir(bench_dir) if f.endswith(".parquet")
    )[0]
    inp = tmp_path / "in"
    inp.mkdir()
    shutil.copy(os.path.join(bench_dir, part), inp / part)

    out = tmp_path / "nodes"
    ckpt = tmp_path / "ckpt"
    driver = tmp_path / "driver.py"
    driver.write_text(
        "import sys\n"
        "from open_parse_spark.cli import main\n"
        "sys.exit(main(sys.argv[1:]))\n"
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zip_path),
            str(driver),
            "parse",
            "--input", str(inp),
            "--output", str(out),
            "--checkpoint", str(ckpt),
            "--n-buckets", "4",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=str(tmp_path),  # NOT the repo root: the zip must supply the pkg
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]

    import duckdb

    con = duckdb.connect()
    n_nodes, n_turns = con.execute(
        f"SELECT count(*), count(DISTINCT (conv_id, turn_idx)) FROM '{out}/**/*.parquet'"
    ).fetchone()
    (in_turns,) = con.execute(
        f"SELECT count(*) FROM '{inp}/*.parquet' WHERE text IS NOT NULL AND text <> ''"
    ).fetchone()
    assert n_nodes > 0
    # a turn yields zero rows only when every node is filtered (e.g. all
    # stubs) — so distinct output turns is a large subset of input turns
    assert 0 < n_turns <= in_turns, (n_turns, in_turns)
    assert n_turns >= 0.8 * in_turns, (n_turns, in_turns)
    # parse semantics byte-equality is covered by tests/test_spark_pipeline.py;
    # this test pins the deploy path: zip + --py-files + cli, off-repo cwd
