"""CLI REPL statement runner (≙ HBaseSQLCliDriver loop)."""

from __future__ import annotations

import io

from heracles_spark.cli import run_statement, HELP


def test_run_statement_select(hsession):
    out = io.StringIO()
    run_statement(hsession, "SELECT 1 AS a, 'x' AS b", out)
    text = out.getvalue()
    assert "a\tb" in text and "1\tx" in text and "Time taken:" in text


def test_run_statement_ddl_flow(hsession, tmp_path):
    out = io.StringIO()
    run_statement(hsession, "CREATE TABLE c1 (k INT, v STRING) "
                            "TBLPROPERTIES('keyCols'='k')", out)
    run_statement(hsession, "INSERT INTO c1 VALUES (1, NULL)", out)
    run_statement(hsession, "SELECT * FROM c1", out)
    assert "1\tNULL" in out.getvalue()


def test_help_mentions_surface():
    for kw in ("CREATE TABLE", "LOAD DATA", "keyCols", "DESCRIBE"):
        assert kw in HELP
