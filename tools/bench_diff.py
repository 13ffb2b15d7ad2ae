"""Adjudicate two bench snapshots: common-set totals, per-query
regressions at the >40%-and->0.4s threshold, the median ratio (a uniform
median shift = machine band, not movement), band/machine context, and
the added/removed query cost. Usage:

    python tools/bench_diff.py OLD.json NEW.json
    python tools/bench_diff.py OLD.json NEW1.json NEW2.json   # min-of-news

With 3+ files the per-query MIN across all NEW snapshots is compared
against OLD — the fair read when same-day runs sit in different
page-cache bands (see SURVEY 8.5's round-8 close)."""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        raise SystemExit(2)
    old = json.load(open(sys.argv[1]))
    news = [json.load(open(p)) for p in sys.argv[2:]]
    qo = old["queries"]
    qn: dict[str, float] = {}
    for d in news:
        for k, v in d["queries"].items():
            if v < 0:
                continue
            qn[k] = min(qn.get(k, v), v)
    for name, d in zip(sys.argv[1:], [old] + news):
        print(f"{name}: {d.get('value')}s / {d.get('n_queries')} q / "
              f"{d.get('n_failed')} failed; machine={d.get('machine')}")
    common = sorted(k for k in qo if k in qn and qo[k] >= 0)
    so, sn = sum(qo[k] for k in common), sum(qn[k] for k in common)
    print(f"\ncommon {len(common)}: {so:.1f}s -> {sn:.1f}s "
          f"({(sn / so - 1) * 100:+.1f}%)")
    ratios = [qn[k] / qo[k] for k in common if qo[k] > 0.2]
    if ratios:
        med = statistics.median(ratios)
        print(f"median per-query ratio {med:.3f} "
              f"({'uniform band — adjudicate against it' if abs(med - 1) > 0.05 else 'no band shift'})")
    reg = [(k, qo[k], qn[k]) for k in common
           if qn[k] > qo[k] * 1.4 and qn[k] - qo[k] > 0.4]
    imp = [(k, qo[k], qn[k]) for k in common
           if qo[k] > qn[k] * 1.4 and qo[k] - qn[k] > 0.4]
    print(f"regressions (>40% and >0.4s): {len(reg)}")
    for k, a, b in sorted(reg, key=lambda x: x[1] - x[2]):
        band = (news[-1].get("bands") or {}).get(k)
        print(f"  {k}: {a} -> {b}  band={band}")
    print(f"improvements (same threshold): {len(imp)}")
    for k, a, b in sorted(imp, key=lambda x: x[2] - x[1])[:10]:
        print(f"  {k}: {a} -> {b}")
    added = {k: qn[k] for k in qn if k not in qo}
    removed = sorted(k for k in qo if k not in qn)
    if added:
        print(f"added ({len(added)}): {sum(added.values()):.1f}s total")
        for k, v in sorted(added.items(), key=lambda kv: -kv[1]):
            print(f"  {k}: {v}")
    if removed:
        print(f"removed: {removed}")


if __name__ == "__main__":
    main()
