"""Console (reference ``src/bin/console/main.rs`` parity): script mode,
single-statement mode, DDL + query + timing output."""

import subprocess
import sys


def run_console(*args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-m", "datafusion_archive_spark.console", *args],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )


def test_execute_statement():
    r = run_console("-e", "SELECT 1 + 2 AS three")
    assert r.returncode == 0, r.stderr
    assert "three" in r.stdout
    assert "\n3\n" in r.stdout
    assert "rows" in r.stdout  # timing/row footer


def test_script_mode_with_ddl(tmp_path):
    csv = tmp_path / "c.csv"
    csv.write_text("a,1.5\nb,2.5\nc,9.0\n")
    script = tmp_path / "s.sql"
    script.write_text(
        f"""
        CREATE EXTERNAL TABLE t (name VARCHAR, v DOUBLE)
        STORED AS CSV WITHOUT HEADER ROW LOCATION '{csv}';
        SELECT name FROM t WHERE v < 3 ORDER BY name;
        """
    )
    r = run_console("--script", str(script))
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout  # DDL ack
    assert "a\nb\n" in r.stdout


def test_error_continues_and_exits_nonzero():
    r = run_console("-e", "SELECT * FROM missing_table")
    assert r.returncode == 1
    assert "Error:" in r.stderr
