"""CLI tests (reference cli.ts entry point: JSONL in → pipeline → JSONL out)."""

from __future__ import annotations

import json

from aggo_spark.cli import main


def test_cli_file_group(tmp_path, capsys, spark):
    data = tmp_path / "d.jsonl"
    data.write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"name": "Alice", "age": 30, "cat": "a"},
                {"name": "Bob", "age": 20, "cat": "b"},
                {"name": "Cara", "age": 40, "cat": "a"},
                {"name": "Dan", "age": 22, "cat": "a"},
            ]
        )
    )
    rc = main([
        '[{"$match": {"age": {"$gte": 25}}},'
        ' {"$group": {"_id": "$cat", "n": {"$sum": 1}}},'
        ' {"$sort": {"_id": 1}}]',
        "--file", str(data),
    ])
    assert rc == 0
    out = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert out == [{"_id": "a", "n": 2}]


def test_cli_bad_pipeline(capsys):
    assert main(["not json"]) == 1
    assert "invalid pipeline" in capsys.readouterr().err


def test_cli_skips_malformed_lines(tmp_path, capsys, spark):
    data = tmp_path / "d.jsonl"
    data.write_text('{"x": 1}\nnot-json\n{"x": 2}\n')
    rc = main(['[{"$group": {"_id": null, "n": {"$sum": 1}}}]', "--file", str(data)])
    assert rc == 0
    out = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert out[0]["n"] == 2
