#!/usr/bin/env python
"""Capture .explain("formatted") for named registry queries.

Usage: python plans/r15/capture.py before|after name [name ...]
Writes plans/r15/<name>_<tag>.txt. SF dir from $SPARK_GRAFT_SF_DIR
(default sf0.1 — the bench's scale, so plan claims match the measured
shape).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from parquet_export_spark.plans.inspect import plan_string  # noqa: E402
from parquet_export_spark.queries import REGISTRY  # noqa: E402
from parquet_export_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.dirname(os.path.abspath(__file__))
    spark = get_spark(app_name=f"plan-capture-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan_string(df))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
