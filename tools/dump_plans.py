"""Dump .explain("formatted") for named queries into plans/<round>/.

Usage: python tools/dump_plans.py <round_dir> <suffix> <query> [query ...]

Writes plans/<round_dir>/<query>_<suffix>.txt with the AQE-final
formatted physical plan (the query runs once via the noop sink so AQE
settles before the plan is read — same discipline as explain_audit).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sanctions_data_pipeline_spark.plans import registry  # noqa: E402
from sanctions_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    round_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", round_dir)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plans")
    registry.queries()
    for name in names:
        qd = registry.REGISTRY[name]
        spark.sparkContext.setJobDescription(f"dump_plans:{name}")
        df = qd.build(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        formatted = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} ({suffix}) — explain('formatted'), "
                    f"AQE-final, {sf_dir}\n\n")
            f.write(formatted)
        print(f"wrote {path}")
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
