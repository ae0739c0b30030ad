"""Would a SECOND rescue_near level pay for itself? (VERDICT r13
optional #8, decided by measurement before any implementation.)

The r13 `rescue_near` leaves ~12 component-recall points on the table
at cap=100 (0.8736 vs the 0.9954 uncapped ceiling,
`text_recall_r13.json`) because the sub-band re-cap skips
distinct-fingerprint sub-buckets that are STILL hotter than the cap.
This script simulates the exact operator arithmetic in pure Python on
the same 50k fixture (fingerprints from the oracle's md5 token-hash
definition — identical to the Spark operator's, as the x06 oracle
proves cross-engine) and measures what a level-2 escalation — the same
finer-width sub-banding applied WITHIN each level-1-skipped sub-bucket,
on the other half's remaining bits — would recover, and at what join
cost (Σ m(m−1)/2 fingerprint comparisons per layer).

Pure Python, no JVM: safe to run alongside a Spark sweep.

Usage: python scripts/analyze_rescue_depth2.py [--docs 50000] [--cap 100]
Writes rescue_depth2_r14.json at the repo root.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from bench_dedup_scale import gen_texts  # noqa: E402

MAX_HAMMING = 6
BITS = 32


def fingerprint(text: str) -> int:
    """The operator's 32-bit SimHash: per-token md5 32-bit hash,
    per-bit majority vote (ties -> 0), exactly the x06 oracle SQL."""
    sums = [0] * BITS
    for tok in text.lower().split():
        if not tok:
            continue
        th = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)
        for j in range(BITS):
            sums[j] += 1 if (th >> j) & 1 else -1
    fp = 0
    for j in range(BITS):
        if sums[j] > 0:
            fp |= 1 << j
    return fp


def hamming(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def smallest_w(n_fp: int, cap: int) -> int:
    for w in range(17):
        if n_fp <= cap * (1 << w):
            return w
    return 16


def pairs_within(items, out: set, budget: list) -> None:
    """hamming-verified hub pairs within one fingerprint bucket."""
    n = len(items)
    budget[0] += n * (n - 1) // 2
    for i in range(n):
        fa, ha = items[i]
        for j in range(i + 1, n):
            fb, hb = items[j]
            if ha != hb and hamming(fa, fb) <= MAX_HAMMING:
                out.add((min(ha, hb), max(ha, hb)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=50_000)
    ap.add_argument("--cap", type=int, default=100)
    ap.add_argument(
        "--out", default=os.path.join(REPO, "rescue_depth2_r14.json")
    )
    args = ap.parse_args()
    cap = args.cap

    texts, edges = gen_texts(args.docs)
    fps = [fingerprint(t) for t in texts]
    near = [(s, d) for s, d, k in edges if k == "near"]
    exact = [(s, d) for s, d, k in edges if k == "exact"]

    halves = [
        lambda fp: fp & 0xFFFF,          # lo
        lambda fp: (fp >> 16) & 0xFFFF,  # hi
    ]

    def comp_recall(pairs: set) -> tuple[float, float]:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            parent[find(a)] = find(b)
        conn = lambda p: find(p[0]) == find(p[1])  # noqa: E731
        return (
            sum(map(conn, exact)) / len(exact),
            sum(map(conn, near)) / len(near),
        )

    # ---- banded candidates under the cap + the uncapped ceiling
    capped: set = set()
    uncapped: set = set()
    skipped_buckets: list[tuple[int, list[int]]] = []  # (band, members)
    for band, half in enumerate(halves):
        buckets: dict[int, list[int]] = defaultdict(list)
        for i, fp in enumerate(fps):
            buckets[half(fp)].append(i)
        for members in buckets.values():
            pw = [
                (i, j)
                for k, i in enumerate(members)
                for j in members[k + 1:]
                if hamming(fps[i], fps[j]) <= MAX_HAMMING
            ]
            uncapped.update((min(a, b), max(a, b)) for a, b in pw)
            if len(members) <= cap:
                capped.update((min(a, b), max(a, b)) for a, b in pw)
            else:
                skipped_buckets.append((band, members))

    # ---- star rescue (identical fingerprints -> hub edges)
    star: set = set()
    fam: dict[int, list[int]] = defaultdict(list)
    for i, fp in enumerate(fps):
        fam[fp].append(i)
    for members in fam.values():
        hub = min(members)
        star.update((hub, m) for m in members if m != hub)

    hub_of = {fp: min(members) for fp, members in fam.items()}

    # ---- level-1 near rescue (the shipped r13 arithmetic)
    l1: set = set()
    l1_budget = [0]
    l2: set = set()
    l2_budget = [0]
    l2_residual_subbuckets = 0
    for band, members in skipped_buckets:
        other = halves[1 - band]
        this = halves[band]
        fp_rows = sorted(
            {(fps[i], other(fps[i]), hub_of[fps[i]]) for i in members}
        )
        n_fp = len(fp_rows)
        w = smallest_w(n_fp, cap)
        mask = (1 << w) - 1
        arms = [lambda o, m=mask: o & m]
        if 1 <= w <= 15:
            arms.append(lambda o, m=mask, w=w: (o >> (16 - w)) & m)
        for arm_idx, key in enumerate(arms):
            subs: dict[int, list] = defaultdict(list)
            for fp, o, hub in fp_rows:
                subs[key(o)].append((fp, hub, o))
            for sub in subs.values():
                if len(sub) <= cap:
                    pairs_within([(f, h) for f, h, _ in sub], l1, l1_budget)
                else:
                    # ---- level-2: the SAME rule within the skipped
                    # sub-bucket, on the other half's remaining bits
                    m_sub = len(sub)
                    w2 = smallest_w(m_sub, cap)
                    lo2 = w if arm_idx == 0 else 0
                    # fresh low/high windows not consumed by level 1
                    mask2 = (1 << w2) - 1
                    keys2 = [
                        lambda o, s=lo2, m=mask2: (o >> s) & m,
                        lambda o, s=max(0, 16 - w2 - (
                            w if arm_idx == 1 else 0
                        )), m=mask2: (o >> s) & m,
                    ]
                    for key2 in keys2:
                        subs2: dict[int, list] = defaultdict(list)
                        for fp, hub, o in sub:
                            subs2[key2(o)].append((fp, hub))
                        for sub2 in subs2.values():
                            if len(sub2) <= cap:
                                pairs_within(sub2, l2, l2_budget)
                            else:
                                l2_residual_subbuckets += 1

    layers = {
        "capped": capped,
        "star": capped | star,
        "l1": capped | star | l1,
        "l2": capped | star | l1 | l2,
        "uncapped": uncapped | star,
    }
    out = {
        "docs": args.docs,
        "cap": cap,
        "skipped_buckets": len(skipped_buckets),
        "l1_fp_comparisons": l1_budget[0],
        "l2_fp_comparisons": l2_budget[0],
        "l2_extra_hub_edges": len(l2 - (capped | star | l1)),
        "l2_residual_subbuckets": l2_residual_subbuckets,
        "component_recall": {},
    }
    for name, pairs in layers.items():
        rx, rn = comp_recall(pairs)
        out["component_recall"][name] = {
            "exact": round(rx, 4), "near": round(rn, 4),
        }
        print(f"{name:9s} exact {rx:.4f} near {rn:.4f} "
              f"(|edges| {len(pairs)})", flush=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
