"""CLI integration: artifact mode and execute mode in-process."""

import json
import os

import pytest
import yaml

from ringo_spark.__main__ import main

INPUT = {
    "tables": [{
        "name": "events",
        "columns": [
            ["event_id", "bigint", "notnull"],
            ["ts", "timestamp without time zone", "notnull"],
            ["user_id", "bigint"],
            ["event_type", "character varying(40)"],
            ["value", "numeric(18,2)"],
            ["props", "text"],
        ],
        "constraints": [{"type": "primary", "column": "event_id"}],
    }],
    "facts": [{
        "name": "events",
        "tablename": "events",
        "columns": [
            {"type": "dimtime", "column": "ts"},
            {"type": "nodimid", "column": "user_id"},
            {"type": "dimval", "column": "event_type", "table": "event_type"},
            {"type": "factcount", "column": "event_count"},
            {"type": "factsum", "column": "value_sum", "sourcecolumn": "value"},
        ],
    }],
    "defaults": {"bigint": "-1", "numeric": "-1",
                 "character": "'__UNKNOWN_VAL__'", "text": "'__UNKNOWN_VAL__'"},
}


@pytest.fixture
def input_yaml(tmp_path):
    p = tmp_path / "input.yaml"
    p.write_text(yaml.safe_dump(INPUT))
    return str(p)


def test_cli_artifacts_mode(input_yaml, tmp_path):
    out = str(tmp_path / "out")
    assert main([input_yaml, out]) == 0
    deps = json.load(open(os.path.join(out, "dependencies.json")))
    assert "fact_events_by_minute" in deps
    for sub in ("create", "fullrefresh", "increfresh"):
        assert "dim_event_type.sql" in os.listdir(os.path.join(out, sub))


def test_cli_validation_failure(tmp_path):
    bad = dict(INPUT, facts=[{
        "name": "f", "tablename": "events",
        "columns": [{"type": "factcount", "column": "n"}],  # no dimtime
    }])
    p = tmp_path / "bad.yaml"
    p.write_text(yaml.safe_dump(bad))
    assert main([str(p), str(tmp_path / "o")]) == 1


def test_cli_execute_mode(spark, input_yaml, tmp_path):
    out, wh = str(tmp_path / "out"), str(tmp_path / "wh")
    rc = main([input_yaml, out, "--execute",
               "--data", "/root/testdata/sf0.001", "--storage", wh,
               "--time-unit", "minute", "--time-upper", "2100-01-01"])
    assert rc == 0
    fact = spark.read.parquet(os.path.join(wh, "fact_events_by_minute"))
    assert fact.count() > 0
    wm = json.load(open(os.path.join(wh, "_watermarks.json")))
    assert "fact_events_by_minute" in wm
