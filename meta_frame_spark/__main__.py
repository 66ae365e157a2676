"""CLI: ``python -m meta_frame_spark <command>``.

Commands
--------
``init-example [dir]``
    Write example configs for all three dialects as JSON files
    (reference parity O5: megatron.py:113-115 wrote
    ``example_metadata.json`` as an *import side effect*; here it is
    an explicit command).
``run --config FILE --input PATH --output PATH [--dialect a|b|nested]``
    Execute a config against an input table and write the result
    (parquet). The minimal batch entrypoint for cluster submission via
    ``spark-submit``.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

EXAMPLE_PIPELINE = {
    "iterations": [
        {
            "id": "by_flag_status",
            "level_1": {
                "derive": {"revenue": "l_extendedprice * (1 - l_discount)"},
                "filters": [
                    {"filter_col": "l_quantity", "filter_op": "<", "filter_value": 45}
                ],
                "group_by": ["l_returnflag", "l_linestatus"],
                "aggregations": [
                    {"agg_col": "revenue", "agg_func": "sum", "new_name": "sum_revenue"}
                ],
            },
            "level_2": {
                "group_by": ["l_returnflag"],
                "aggregations": [
                    {"agg_col": "sum_revenue", "agg_func": "max", "new_name": "max_revenue"}
                ],
            },
        }
    ]
}

EXAMPLE_TREE = {
    "unique_id": "orders_rollup",
    "filters": ["o_totalprice > 0"],
    "aggregation": {
        "group_by": ["o_custkey"],
        "aggregations": {"o_totalprice": ["sum", "max"]},
        "rename": {"sum_o_totalprice": "total_spend"},
    },
    "children": [
        {
            "unique_id": "customer_dim",
            "data_path": "customer.parquet",
            "broadcast": True,
            "join": {"on": "o_custkey", "how": "left"},
        }
    ],
}

EXAMPLE_NESTED = {
    "id": "root",
    "group_by": ["l_returnflag"],
    "aggregate": {
        "l_quantity": "sum",
        "l_extendedprice": {"filter": "l_quantity > 10", "function": "avg"},
    },
    "rename": {"l_quantity": "total_qty", "l_extendedprice": "avg_price_gt10"},
    "filter": ["l_linestatus = 'O'"],
    "children": [
        {
            "id": "by_flag",
            "link": ["l_returnflag"],
            "aggregate": {"l_orderkey": "count"},
            "rename": {"l_orderkey": "n_lines"},
        }
    ],
}


def cmd_init_example(out_dir: str) -> None:
    d = Path(out_dir)
    d.mkdir(parents=True, exist_ok=True)
    for name, cfg in [
        ("example_pipeline.json", EXAMPLE_PIPELINE),
        ("example_tree.json", EXAMPLE_TREE),
        ("example_nested.json", EXAMPLE_NESTED),
    ]:
        (d / name).write_text(json.dumps(cfg, indent=2) + "\n")
        print(f"wrote {d / name}")


def cmd_run(config_path: str, input_path: str, output_path: str, dialect: str) -> None:
    from meta_frame_spark import (
        aggregate_and_join,
        get_session,
        load_data,
        nested_aggregate,
        run_pipeline,
        save_data,
    )

    config = json.loads(Path(config_path).read_text())
    spark = get_session(app_name="meta_frame_spark-run")
    df = load_data(spark, "auto", path=input_path)

    if dialect == "a":
        results = run_pipeline(df, config)
        for it_id, out in results.items():
            save_data(out, f"{output_path.rstrip('/')}/{it_id}")
            print(f"wrote {output_path.rstrip('/')}/{it_id}")
    elif dialect == "b":
        out = aggregate_and_join(df, config)
        save_data(out, output_path)
        print(f"wrote {output_path}")
    else:
        out = nested_aggregate(df, config)
        save_data(out, output_path)
        print(f"wrote {output_path}")


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="meta_frame_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    p_init = sub.add_parser("init-example", help="write example configs")
    p_init.add_argument("dir", nargs="?", default=".")

    p_run = sub.add_parser("run", help="run a config against an input table")
    p_run.add_argument("--config", required=True)
    p_run.add_argument("--input", required=True)
    p_run.add_argument("--output", required=True)
    p_run.add_argument("--dialect", choices=["a", "b", "nested"], default="a")

    args = p.parse_args(argv)
    if args.cmd == "init-example":
        cmd_init_example(args.dir)
    else:
        cmd_run(args.config, args.input, args.output, args.dialect)
    return 0


if __name__ == "__main__":
    sys.exit(main())
