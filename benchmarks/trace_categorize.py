"""Categorize a saved train-step trace (rows.json + hlo.txt) offline.

Buckets every device fusion of a `trace_tools.py --graph train` capture by
the FULL JAX op_name path (forward = ``jvp(UNet)``, backward =
``transpose(jvp(UNet))``, optimizer/metrics by source file) and prints
per-category totals plus the conv MXU share — the train-step
speed-of-light table in BASELINE.md. No device needed:

    python benchmarks/trace_categorize.py benchmarks/traces_r5/trace_train_*
"""

from __future__ import annotations

import collections
import json
import re
import sys


def _full_info(hlo_text: str):
    """name -> (op_name, source, kind, shape) with the FULL op_name path."""
    info = {}
    head = re.compile(r"\s+(?:ROOT )?%?([\w.\-]+) = ")
    for line in hlo_text.splitlines():
        m = head.match(line)
        if not m:
            continue
        om = re.search(r'op_name="([^"]*)"', line)
        sf = re.search(r'source_file="([^"]*)"', line)
        sl = re.search(r"source_line=(\d+)", line)
        km = re.search(r"= (?:\([^=]*?\)|\S+) ([\w\-]+)\(", line)
        # The TPU conv emitter: every fusion's backend_config carries an
        # (often empty) kernel_window_bounds list; only convs have entries.
        conv = '"kernel_window_bounds":["' in line
        info[m.group(1)] = (
            om.group(1) if om else "",
            (sf.group(1).split("/")[-1] + ":" + sl.group(1)) if sf and sl else "",
            km.group(1) if km else "?",
            conv,
        )
    return info


def categorize(op_name: str, src: str) -> str:
    if "transpose(jvp" in op_name:
        return "bwd"
    if src.startswith(("losses.py", "metrics.py")) or "/loss" in op_name:
        return "loss+metrics"
    if "jvp(" in op_name:
        return "fwd"
    if src.startswith(("engine.py",)) or "adam" in op_name or not op_name:
        return "opt/copy/other"
    return "opt/copy/other"


def _family(op_name: str, kind: str) -> str:
    leaf = op_name.split("/")[-1] if op_name else kind
    if "conv_general_dilated" in leaf:
        return "conv"
    if "reduce_window" in leaf or kind == "reduce-window":
        return "pool"
    if kind == "select-and-scatter" or "select_and_scatter" in leaf:
        return "pool-bwd(sas)"
    if "reduce" in leaf:
        return "reduce(BN/SE)"
    if kind in ("copy", "reverse", "transpose", "bitcast", "split"):
        return "datamove"
    return "elementwise/other"


def report(trace_dir: str, iters: int = 3, top: int = 0):
    rows = json.load(open(trace_dir + "/rows.json"))
    info = _full_info(open(trace_dir + "/hlo.txt").read())
    cat_ms = collections.Counter()
    fam_ms = collections.Counter()
    unmatched = 0.0
    for ms, nm, _shape, _op, _src in rows:
        op_name, src, kind, is_conv = info.get(nm, ("", "", "?", False))
        if nm not in info:
            unmatched += ms
        cat = categorize(op_name, src)
        fam = "conv" if is_conv else _family(op_name, kind)
        cat_ms[cat] += ms
        fam_ms[(cat, fam)] += ms
    total = sum(ms for ms, *_ in rows)
    print(f"== {trace_dir}")
    print(f"device total {total:8.1f} ms/iter   (unmatched {unmatched:.1f})")
    for cat, ms in cat_ms.most_common():
        fams = ", ".join(
            f"{f} {v:.1f}" for (c, f), v in fam_ms.most_common() if c == cat
        )
        print(f"  {cat:14s} {ms:8.1f} ms ({100 * ms / total:4.1f}%)  [{fams}]")
    if top:
        print(f"  -- top {top} bwd rows --")
        shown = 0
        for ms, nm, shape, _op, _src in rows:
            op_name, src, kind, _ = info.get(nm, ("", "", "?", False))
            if categorize(op_name, src) != "bwd":
                continue
            print(f"  {ms:7.2f} ms  {shape[:40]:40s} "
                  f"{op_name.split(')/')[-1][:46]:46s} {src}")
            shown += 1
            if shown >= top:
                break
    return total, dict(cat_ms), dict(fam_ms)


def _cli():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    top = 12 if "--top" in sys.argv else 0
    for d in args:
        report(d, top=top)


if __name__ == "__main__":
    _cli()
