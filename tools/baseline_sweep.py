#!/usr/bin/env python3
"""DuckDB baseline sweep: time every oracle standalone at a given SF.

Usage: python3 tools/baseline_sweep.py <sfDir> <verifyOutDir> <out.json> [round]

Runs each oracle_sql.json entry in its OWN DuckDB connection (cold,
standalone — the per-query lower bound an operator-equivalent engine
pays), appends _total_sec/_n_oracles/_sf/_round. Per-query wall-clock
cap of 900 s (r10's floor) — with the round-11 chained-BFS oracles no
query should reach it; if one does, the entry records the floor and
the _note says so, because a floored total is a LOWER bound and not
comparable round-over-round.
"""
import sys, json, glob, os, time
import multiprocessing as mp


def run_one(sf_dir: str, sql: str, q):
    import duckdb
    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/ddb_sweep'")
    for f in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(f).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")
    t0 = time.time()
    try:
        con.execute(sql).fetchall()
        q.put(round(time.time() - t0, 3))
    except Exception as e:
        q.put(f"ERROR: {type(e).__name__}")


def cpu_stat():
    l = [x for x in open("/proc/stat") if x.startswith("cpu ")][0].split()[1:]
    v = [int(x) for x in l]
    return sum(v), (v[7] if len(v) > 7 else 0)


def main(sf_dir, out_dir, out_json, rnd):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    res, floored = {}, []
    st0 = cpu_stat()
    for name in sorted(oracle):
        q = mp.Queue()
        p = mp.Process(target=run_one, args=(sf_dir, oracle[name], q))
        t0 = time.time()
        p.start()
        p.join(timeout=900)
        if p.is_alive():
            p.terminate(); p.join()
            res[name] = 900.0
            floored.append(name)
            print(f"{name:32s} TIMEOUT-FLOOR 900.0")
        else:
            v = q.get()
            res[name] = v if isinstance(v, float) else 900.0
            if not isinstance(v, float):
                floored.append(f"{name} ({v})")
            print(f"{name:32s} {res[name]}")
    total = round(sum(v for v in res.values()), 1)
    res["_total_sec"] = total
    res["_n_oracles"] = len(oracle)
    res["_sf"] = sf_dir
    res["_round"] = rnd
    note = ("all oracles completed standalone; no timeout-floored entries"
            if not floored else
            f"FLOORED (total is a lower bound): {', '.join(floored)}")
    res["_note"] = note
    # hypervisor steal over the sweep window: same honesty contract as
    # Bench's steal_pct_battery — a steal-inflated sweep overstates the
    # DuckDB lower bound and flatters the Spark/DuckDB ratio
    st1 = cpu_stat()
    res["_steal_pct"] = round(
        100.0 * (st1[1] - st0[1]) / max(1, st1[0] - st0[0]), 2)
    json.dump(res, open(out_json, "w"), indent=0)
    print(f"TOTAL {total}s over {len(oracle)} oracles; {note}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3],
         int(sys.argv[4]) if len(sys.argv) > 4 else 0)
