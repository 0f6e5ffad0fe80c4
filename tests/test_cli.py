"""The interactive CLI front-end (python -m ai_etl_studio_spark), driven
as a real subprocess: schema browse, NL question, raw SQL, CSV export,
and the DDL-rejection error relation."""

from __future__ import annotations

import os
import subprocess
import sys


def test_cli_session(tmp_path):
    csv_dir = tmp_path / "out.csv"
    script = "\n".join(
        [
            "\\schema",
            "top 3 products",
            "\\sql SELECT c_mktsegment, COUNT(*) AS n FROM customer GROUP BY c_mktsegment",
            "\\explain",
            f"\\csv {csv_dir}",
            "\\sqlx SELECT 1",  # unknown command, NOT a mis-sliced \sql
            "\\sql DROP TABLE customer",
            "\\q",
        ]
    )
    proc = subprocess.run(
        [sys.executable, "-m", "ai_etl_studio_spark", "--sf-dir", "/root/testdata/sf0.001"],
        input=script,
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    out = proc.stdout
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "10 tables registered" in out
    assert "Columns of customer" in out  # schema browser
    assert "new gear" in out  # flagship NL query result
    assert "BUILDING" in out  # raw SQL result
    assert "Physical Plan" in out  # \explain of the last result
    assert "error_message" in out  # DDL rejected as error relation
    assert "unknown command \\sqlx" in out  # token-exact dispatch
    # CSV really written (distributed write -> part files)
    parts = [f for f in os.listdir(csv_dir) if f.endswith(".csv")]
    assert parts
    body = open(csv_dir / parts[0]).read()
    assert body.startswith("c_mktsegment,n")
    # and the base tables survived the DROP attempt
    assert "only SELECT" in out or "error" in out.lower()
