"""Round-15 perf adjudication: time the three drifted forecaster-family
bench queries (forecaster_ttf, ts_cv_grid, sim_ivfpq_build) min-of-3
against the CURRENT tree, printing per-pass wall + load1 so code cost
separates from host weather. Run from any checkout:
    python tools/ttf_profile.py [sf_dir]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as e
from scalecast_spark import get_session


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session("ttf-profile")
    names = ["forecaster_ttf", "ts_cv_grid", "sim_ivfpq_build"]
    fns = {
        "forecaster_ttf": e.q_forecaster_ttf,
        "ts_cv_grid": e.q_ts_cv_grid,
        "sim_ivfpq_build": e.q_sim_ivfpq_build,
    }
    # warm the session/catalog once so pass 1 isn't JVM warmup
    e.q_ts_metrics(spark, sf).write.mode("overwrite").format("noop").save()
    results = {}
    for name in names:
        walls = []
        for p in range(3):
            l0 = os.getloadavg()[0]
            t0 = time.time()
            fns[name](spark, sf).write.mode("overwrite").format("noop").save()
            w = time.time() - t0
            walls.append(w)
            print(f"{name} pass{p} wall={w:.3f} load1_pre={l0:.1f}",
                  flush=True)
        results[name] = round(min(walls), 3)
    print("MIN-OF-3:", results, flush=True)


if __name__ == "__main__":
    main()
