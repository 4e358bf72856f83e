"""CLI — parity with the reference's ``ringo [flags] INPUT OUTPUT``
(``app/Ringo/ArgParser.hs:92-119``), extended with an ``--execute`` mode
that actually runs the derived pipelines on Spark (the reference only
emits SQL files).

Generate artifacts (reference behavior)::

    python -m ringo_spark input.yaml output/

Execute against parquet sources::

    python -m ringo_spark input.yaml output/ \
        --execute --data /root/testdata/sf0.001 --storage /tmp/warehouse \
        --mode full --time-upper 2100-01-01
"""

from __future__ import annotations

import argparse
import datetime as dt
import sys

from .input_parser import parse_input
from .model import PopulationMode, Settings, TimeUnit
from .validator import ValidationFailed, make_env


def build_settings(args) -> Settings:
    return Settings(
        dim_prefix=args.dim_prefix,
        fact_prefix=args.fact_prefix,
        time_unit=TimeUnit[args.time_unit.upper()],
        fact_count_distinct_error_rate=args.count_distinct_error_rate,
        foreign_key_id_coalesce_value=args.fk_coalesce_value,
        table_name_suffix_template=args.suffix_template,
    )


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="ringo_spark")
    p.add_argument("input", help="YAML schema+facts input file")
    p.add_argument("output", help="artifact output directory")
    p.add_argument("--dim-prefix", default="dim_")
    p.add_argument("--fact-prefix", default="fact_")
    p.add_argument("--time-unit", default="minute",
                   choices=["second", "minute", "hour", "day", "week"])
    p.add_argument("--count-distinct-error-rate", type=float, default=0.05)
    p.add_argument("--fk-coalesce-value", type=int, default=-1)
    p.add_argument("--suffix-template", default="{{suff}}")
    p.add_argument("--execute", action="store_true",
                   help="run the pipelines on Spark instead of only "
                        "emitting artifacts")
    p.add_argument("--data", help="directory of <table>.parquet sources")
    p.add_argument("--storage", help="warehouse directory for derived tables")
    p.add_argument("--mode", default="full", choices=["full", "incremental"])
    p.add_argument("--time-upper", help="ISO timestamp upper bound")
    p.add_argument("--time-lower", help="ISO timestamp lower bound (incremental)")
    args = p.parse_args(argv)

    tables, facts, defaults = parse_input(args.input)
    try:
        env = make_env(tables, facts, build_settings(args), defaults)
    except ValidationFailed as vf:
        for e in vf.errors:
            print(e, file=sys.stderr)
        return 1

    from .engine import Engine

    if not args.execute:
        # artifacts only — no Spark session needed for schemas + SQL, but
        # Engine wants one; generate via a slim path instead
        from .engine import Engine as _E

        class _NoSpark(_E):
            def __init__(self, env_, out):
                self.env = env_
                self.storage = out

        _NoSpark(env, args.output).write_artifacts(args.output)
        print(f"artifacts written to {args.output}")
        return 0

    if not (args.data and args.storage and args.time_upper):
        p.error("--execute requires --data, --storage and --time-upper")
    from .catalog import get_spark

    spark = get_spark("ringo-cli")
    eng = Engine(spark, env, args.storage)
    eng.load_sources(args.data)
    mode = PopulationMode(args.mode)
    upper = dt.datetime.fromisoformat(args.time_upper)
    lower = dt.datetime.fromisoformat(args.time_lower) if args.time_lower else None
    produced = eng.run(mode, upper, lower)
    eng.write_artifacts(args.output)
    print(f"populated: {', '.join(produced)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
