#!/usr/bin/env python3
"""Bench artifact tooling.

Modes:
  python3 tools/bench_compare.py diff OLD.json NEW.json
      Parse two driver BENCH_r{N}.json artifacts (or raw bench stdout
      captures) and print per-query spark-time deltas, flagging any
      regression or improvement > 1.5x so round-over-round drift
      self-reports (the r8 q66/q96 case).

  python3 tools/bench_compare.py duck BENCH.json [sf_dir] [verify_out]
      Compare a bench artifact's spark times against DuckDB running the
      oracle SQL locally — the local approximation of driver grading.

Both modes understand every emission format the bench has used:
  r9+:  {"bq1":"1:0.19/0.08 2:0.33/x ..."}  (id:cold/oracle, compact)
        {"warm":"23:0.89 ..."}
  r7-8: {"bench_q_1of2":{"q01":[0.19,0.08],...}}
  r<=6: {"queries":{"q01_name":0.19,...}}
Parsing is regex-over-the-whole-text, so a front-truncated tail still
yields every pair that survived the window.
"""
import json, re, sys


def load_text(path):
    """The captured text: a driver artifact's tail, or raw stdout."""
    raw = open(path).read()
    try:
        d = json.loads(raw)
        if isinstance(d, dict) and "tail" in d:
            return d["tail"]
    except ValueError:
        pass
    return raw


def parse_pairs(text):
    """query-id -> (spark_sec, oracle_sec|None); plus warm map."""
    pairs, warm = {}, {}
    # r9+ compact: id:cold[/oracle] inside {"bqN":"..."} lines — r18
    # omits "/oracle" entirely when the oracle ran under 0.05s (parse
    # as 0.0, distinct from "/x" = oracle didn't run -> None)
    for m in re.finditer(r'"bq\d"\s*:\s*"([^"]*)"', text):
        for e in re.finditer(r'(\d+):([\d.]+)(?:/([\d.]+|x))?(?=\s|"|$)', m.group(1)):
            q, c, o = e.groups()
            pairs[int(q)] = (
                float(c),
                0.0 if o is None else (None if o == "x" else float(o)))
    for m in re.finditer(r'"warm"\s*:\s*"([^"]*)"', text):
        for e in re.finditer(r'(\d+):([\d.]+)', m.group(1)):
            warm[int(e.group(1))] = float(e.group(2))
    if pairs:
        return pairs, warm
    # r7-8: "qNN":[spark,oracle]
    for m in re.finditer(r'"q(\d+)"\s*:\s*\[([\d.]+),([\d.]+|null)\]', text):
        q, c, o = m.groups()
        pairs[int(q)] = (float(c), None if o == "null" else float(o))
    if pairs:
        return pairs, warm
    # r<=6: "qNN_name":seconds
    for m in re.finditer(r'"q(\d+)_\w+"\s*:\s*([\d.]+)', text):
        pairs[int(m.group(1))] = (float(m.group(2)), None)
    return pairs, warm


def parse_anomaly(text):
    """r11+ {"anomaly":"id:cold/warm ..."} — queries slow vs their
    oracle on BOTH runs of the epoch (the warm gate's blind spot):
    contention/GC/statement-floor, not a cold-only JIT artifact."""
    out = {}
    for m in re.finditer(r'"anomaly"\s*:\s*"([^"]*)"', text):
        for e in re.finditer(r'(\d+):([\d.]+)/([\d.]+)', m.group(1)):
            out[int(e.group(1))] = (float(e.group(2)), float(e.group(3)))
    return out


def parse_headline(text):
    out = {}
    for k in ("oracle_total", "ratio", "value", "warm_total", "baseline_total"):
        m = re.search(r'"%s"\s*:\s*([\d.]+)' % k, text)
        if m:
            out[k] = float(m.group(1))
    return out


def diff(old_path, new_path):
    ot, nt = load_text(old_path), load_text(new_path)
    op, _ = parse_pairs(ot)
    np_, nwarm = parse_pairs(nt)
    nanom = parse_anomaly(nt)
    oh, nh = parse_headline(ot), parse_headline(nt)
    flagged = []
    for q in sorted(set(op) & set(np_)):
        o, n = op[q][0], np_[q][0]
        base = max(min(o, n), 0.05)  # ignore sub-50ms jitter ratios
        if max(o, n) / base > 1.5 and abs(o - n) > 0.5:
            flagged.append((max(o, n) / base, q, o, n))
    print(f"{'query':>6s} {'old':>8s} {'new':>8s} {'x':>6s}  note")
    for r, q, o, n in sorted(flagged, reverse=True):
        note = "REGRESSED" if n > o else "improved"
        if q in nwarm and n > o:
            note += f" (warm={nwarm[q]:.2f}s -> epoch-position, not plan)"
        elif q in nanom and n > o:
            c, w = nanom[q]
            note += (f" (anomaly: slow BOTH runs, cold={c:.2f}s warm={w:.2f}s"
                     " -> epoch contention or statement floor, check plan)")
        print(f"q{q:<5d} {o:8.2f} {n:8.2f} {r:6.1f}  {note}")
    if nanom:
        qs = " ".join(f"q{q}={c:.2f}/{w:.2f}" for q, (c, w) in sorted(nanom.items()))
        print(f"anomaly (slow vs oracle on both runs): {qs}")
    if not flagged:
        print("  (no per-query delta > 1.5x and > 0.5s)")
    missing = sorted(set(op) ^ set(np_))
    if missing:
        print("only in one round:", ", ".join(f"q{q}" for q in missing))
    if "value" in oh and "value" in nh:
        print(f"\nTOTAL old={oh['value']:.1f}s new={nh['value']:.1f}s"
              + (f" ratio_new={nh['ratio']}" if "ratio" in nh else ""))


TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck(bench_path, sf, out):
    import duckdb, time
    pairs, _ = parse_pairs(load_text(bench_path))
    con = duckdb.connect()
    con.execute("PRAGMA threads=32")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    by_id = {int(re.match(r"q(\d+)", n).group(1)): s
             for n, s in oracle.items()}
    duckt = {}
    for q in sorted(by_id):
        t0 = time.time()
        try:
            con.execute(by_id[q]).fetchall()
            duckt[q] = time.time() - t0
        except Exception:
            duckt[q] = None
    print(f"{'query':>6s} {'spark':>8s} {'duck':>8s} {'ratio':>7s}")
    rows = [((pairs[q][0] / duckt[q]) if duckt.get(q) else 0, q)
            for q in sorted(pairs) if q in by_id]
    for r, q in sorted(rows, reverse=True):
        d = duckt.get(q)
        print(f"q{q:<5d} {pairs[q][0]:8.2f} "
              f"{'     n/a' if not d else format(d, '8.2f')} "
              f"{'' if not d else format(r, '7.1f')}")
    # both totals over the SAME query set: a front-truncated artifact
    # must not understate the ratio by dropping spark time only
    common = [q for q in pairs if q in by_id and duckt.get(q)]
    tot_s = sum(pairs[q][0] for q in common)
    tot_d = sum(duckt[q] for q in common)
    print(f"\nTOTAL spark={tot_s:.1f}s duck={tot_d:.1f}s "
          f"ratio={tot_s / tot_d:.2f}")


def main():
    if len(sys.argv) >= 4 and sys.argv[1] == "diff":
        diff(sys.argv[2], sys.argv[3])
    elif len(sys.argv) >= 3 and sys.argv[1] == "duck":
        duck(sys.argv[2],
             sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1",
             sys.argv[4] if len(sys.argv) > 4 else "/tmp/verify_out")
    else:
        print(__doc__)
        sys.exit(2)


if __name__ == "__main__":
    main()
