"""Per-image diff of two train-step traces captured by prof_train_trace.py.

Answers "what changed between batch A and batch B" at the HLO-op level:
groups each trace's TPU XLA-op events by (category, instruction text with
.NNN id suffixes stripped), sums durations, normalizes per image
(steps x batch), and prints the largest regressions plus per-category
totals. Batch-carrying shapes appear in the instruction text, so only
batch-independent ops (weight/BN-scalar copies, sliced weight prefetches)
match one-to-one across traces — exactly the ops that expose XLA
memory-space-assignment behavior shifts; batch-dependent work is compared
through the category totals. This is the tool that attributed the batch-12
training cliff (PERF.md "Batch-size curve, attributed").

Usage: python scripts/prof_trace_diff.py <logdirA> <batchA> <logdirB> <batchB> [steps=64]
e.g.   python scripts/prof_trace_diff.py /tmp/rcvpose_train_trace_b8 8 \
           /tmp/rcvpose_train_trace_b12 12
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.prof_train_trace import report  # noqa: E402


def load(logdir, steps, batch):
    rows, _ = report(logdir, steps)
    out = {}
    for r in rows:
        name = re.sub(r"\.\d+", "", r["name"])  # align same-role ops
        key = (r["category"], name)
        t, n = out.get(key, (0.0, 0))
        out[key] = (t + r["us"] / 1e3 / steps / batch, n + r["count"])
    return out


def main():
    dir_a, batch_a, dir_b, batch_b = sys.argv[1:5]
    steps = int(sys.argv[5]) if len(sys.argv) > 5 else 64
    a = load(dir_a, steps, int(batch_a))
    b = load(dir_b, steps, int(batch_b))

    keys = set(a) | set(b)
    rows = sorted(
        ((b.get(k, (0.0, 0))[0] - a.get(k, (0.0, 0))[0],
          a.get(k, (0.0, 0))[0], b.get(k, (0.0, 0))[0], k) for k in keys),
        reverse=True)
    print(f"{'delta ms/img':>12} {'A':>8} {'B':>8}  [category] name")
    for d, ta, tb, (cat, name) in rows[:30]:
        print(f"{d:12.4f} {ta:8.4f} {tb:8.4f}  [{cat}] {name[:120]}")

    print("-- total per-image by category --")
    cats = {}
    for k in keys:
        ca, cb = cats.get(k[0], (0.0, 0.0))
        cats[k[0]] = (ca + a.get(k, (0.0, 0))[0], cb + b.get(k, (0.0, 0))[0])
    for cat, (ca, cb) in sorted(cats.items(),
                                key=lambda kv: -(kv[1][1] - kv[1][0])):
        print(f"  {cat:30s} A {ca:8.3f}  B {cb:8.3f}  "
              f"delta {cb - ca:+8.3f} ms/img")


if __name__ == "__main__":
    main()
