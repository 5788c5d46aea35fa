"""q5 runtime-Bloom-filter investigation at gen scale (r15, VERDICT r14
#4 / guide §3.2): does Spark's automatic runtime filter injection
(SPARK-32268) fire on q5's lineitem⋈orders shape, and does it pay?

Findings context: at sf0.1 the question is structurally moot — every
q5 join (including lineitem⋈orders) plans as BroadcastHashJoin, so
there is no shuffle for a Bloom filter to protect and the injection
rule correctly declines (it skips joins it expects to broadcast). This
probe runs at gen scale where the filtered orders side outgrows the
broadcast threshold and the join becomes a real shuffle join, then
measures three postures interleaved:

  A. defaults (production thresholds: creation 10MB, application 10GB)
  B. injection enabled for this scan size
     (applicationSideScanSizeThreshold lowered so the gen-scale
     lineitem qualifies — standing in for the 100 TB fact, which
     passes the DEFAULT threshold)
  C. the 100 TB join shape EMULATED: autoBroadcastJoinThreshold=-1
     turns the unhinted lineitem⋈orders into a real shuffle join
     (q5's explicit F.broadcast dim hints still broadcast — exactly
     the production posture where orders outgrows broadcast), bloom
     thresholds at defaults
  D. shape C with injection enabled for this scan size — does the
     optimizer inject might_contain on the lineitem side, and does the
     filter pay for itself?

Result-identity is asserted (collected rows equal across postures).

Usage: python -m tools.q5_bloom_probe [--sf DIR] [--reps 3]
       [--out Q5_BLOOM_r15.json]
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    args = sys.argv[1:]

    def _opt(name, default, cast=str):
        return cast(args[args.index(name) + 1]) if name in args else default

    sf_dir = _opt("--sf", "/root/repo/.fixtures/gen1")
    reps = int(_opt("--reps", "3"))
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = _opt("--out", os.path.join(here, "Q5_BLOOM_r15.json"))

    from smallquery_spark.queries import REGISTRY, load_all
    from smallquery_spark.session import get_session

    load_all()
    spark = get_session("q5-bloom-probe")

    APP = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    BCAST = "spark.sql.autoBroadcastJoinThreshold"
    postures = {
        "A_defaults": {},
        "B_bloom_app_low": {APP: "1MB"},
        "C_shuffle_shape": {BCAST: "-1"},
        "D_shuffle_bloom": {BCAST: "-1", APP: "1MB"},
    }
    defaults = {k: spark.conf.get(k) for k in (APP, BCAST)}

    def set_posture(conf: dict) -> None:
        for k, v in defaults.items():
            spark.conf.set(k, v)
        for k, v in conf.items():
            spark.conf.set(k, v)

    def build():
        return REGISTRY["q5_local_supplier_volume"].fn(spark, sf_dir)

    # plan + result identity, one pass per posture
    plans: dict[str, dict] = {}
    rows_ref = None
    for name, conf in postures.items():
        set_posture(conf)
        df = build()
        rows = df.collect()
        if rows_ref is None:
            rows_ref = rows
        assert rows == rows_ref, f"posture {name} changed the result"
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        plans[name] = {
            "might_contain": plan.count("might_contain"),
            "bloom_agg": plan.count("bloom_filter"),
            "smj": len(
                [ln for ln in plan.splitlines() if ") SortMergeJoin" in ln]
            ),
            "shj": len(
                [ln for ln in plan.splitlines() if ") ShuffledHashJoin" in ln]
            ),
            "bhj": len(
                [ln for ln in plan.splitlines() if ") BroadcastHashJoin" in ln]
            ),
        }
        with open(
            os.path.join(here, "plans", "r15", f"q5_gen_{name}.txt"), "w"
        ) as f:
            f.write(f"# q5 at {sf_dir}, posture {name} (AQE final)\n")
            f.write(plan)

    # walls, round-robin x reps, min per posture
    walls: dict[str, list[float]] = {n: [] for n in postures}
    for _ in range(reps):
        for name, conf in postures.items():
            set_posture(conf)
            df = build()
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            walls[name].append(round(time.time() - t0, 3))
    record = {
        "sf_dir": sf_dir,
        "plans": plans,
        "walls": walls,
        "min_sec": {n: min(w) for n, w in walls.items()},
        "reps": reps,
    }
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
    print(json.dumps({"plans": plans, "min_sec": record["min_sec"]}))
    print(f"-> {out_path}")


if __name__ == "__main__":
    main()
