"""Capture and analyze jax.profiler device traces of serving programs.

The per-op tables in BASELINE.md ("Speed of light...") were produced with
this tool on the attached TPU v5e. Usage (run from /tmp so the test
conftest doesn't force the CPU backend):

    PYTHONPATH=/root/repo:/root/.axon_site python -m benchmarks.trace_tools \
        --graph std|s2d|int8 [--batch 64] [--tile 512]

It jits the requested U-Net-CA serving graph, traces 3 iterations, joins
the trace's per-fusion durations with the compiled HLO's op_name/source
metadata, and prints a ms/iter table. Works on any backend that supports
jax.profiler (the axon tunnel does).
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import re
import tempfile


def _parse_hlo(hlo_text: str):
    """name -> (shape, op, src) from optimized-HLO text.

    Tuple shapes of multi-output fusions embed layout parens —
    ``(f32[64]{0:T(128)S(1)}, f32[16,...]{...:T(8,128)})`` — so the shape
    needs balanced-paren scanning, not a regex (the round-5 first- and
    second-pass train tables both lost those rows to '?').
    """
    info = {}
    head = re.compile(r"\s+(?:ROOT )?%?([\w.\-]+) = ")
    for line in hlo_text.splitlines():
        m = head.match(line)
        if not m:
            continue
        name, rest = m.group(1), line[m.end():]
        if rest.startswith("("):  # tuple shape: scan to the balanced close
            depth, end = 0, len(rest)
            for i, ch in enumerate(rest):
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0:
                        end = i + 1
                        break
            shape, tail = rest[:end], rest[end:]
        else:
            shape, _, tail = rest.partition(" ")
            tail = " " + tail
        km = re.match(r"\s*([\w\-]+)\(", tail)
        kind = km.group(1) if km else "?"
        om = re.search(r'op_name="([^"]*)"', line)
        sf = re.search(r'source_file="([^"]*)"', line)
        sl = re.search(r"source_line=(\d+)", line)
        src = (sf.group(1).split("/")[-1] + ":" + sl.group(1)) if sf and sl else ""
        op = (om.group(1) if om else kind).split(")/")[-1]
        info[name] = (shape[:44], op[:40], src)
    return info


def analyze(trace_dir: str, hlo_text: str, iters: int = 3):
    """Join trace fusion durations with HLO metadata -> printed table."""
    info = _parse_hlo(hlo_text)

    paths = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
    assert paths, f"no trace under {trace_dir}"
    data = json.load(gzip.open(sorted(paths)[-1]))
    procs = {
        e["pid"]: e["args"].get("name")
        for e in data["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dur = collections.Counter()
    for e in data["traceEvents"]:
        if (
            e.get("ph") == "X"
            and "dur" in e
            and str(procs.get(e["pid"], "")).startswith("/device:")
        ):
            dur[e["name"]] += e["dur"]

    rows = []
    for nm, us in dur.most_common():
        if nm.startswith("jit_"):
            print(f"TOTAL {us / (1000 * iters):8.2f} ms/iter  {nm[:50]}")
            continue
        if nm.isdigit():  # whole-program execution spans, one per iteration
            continue
        shape, op, src = info.get(nm, ("?", "?", ""))
        rows.append((us / (1000 * iters), nm, shape, op, src))
    for ms, nm, shape, op, src in rows[:40]:
        print(f"{ms:8.2f} ms  {nm:28s} {shape:44s} {op:40s} {src}")
    # full table + HLO saved for offline category analysis (the chip job
    # log only keeps the top 40)
    with open(trace_dir + "/rows.json", "w") as f:
        json.dump(rows, f)
    with open(trace_dir + "/hlo.txt", "w") as f:
        f.write(hlo_text)
    print(f"rows+hlo saved under {trace_dir}")
    return rows


def _build(graph: str, batch: int, tile: int, bf16: bool = False,
           model_name: str = "unet"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from insarseg.models.unet import UNet

    model = UNet(num_classes=2, use_se=True, dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0), jnp.zeros((1, tile, tile, 1)))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, tile, tile, 1)), jnp.float32)

    if graph == "std":
        from insarseg.parallel import make_predict_fn

        predict = make_predict_fn(model, argmax=True)
        return (lambda im: predict(variables, im)), x.astype(jnp.bfloat16)
    if graph == "s2d":
        from insarseg.models.unet_s2d import make_s2d_predict_fn

        return make_s2d_predict_fn(
            model, variables, argmax=True, input_dtype=jnp.bfloat16
        ), x
    if graph == "int8":
        from insarseg.models.unet_int8 import make_int8_predict_fn

        calib = [np.asarray(x[:2], np.float32)]
        return make_int8_predict_fn(variables, calib, argmax=True), x
    if graph == "train":
        # the full jitted train step (fwd+bwd+Adam+sync-BN+metric counts) on
        # the flagship U-Net-CA — round-4 verdict #3 train-step trace.
        # --bf16 traces the compute_dtype=bfloat16 step (f32 master params);
        # --model unet-fast traces the s2d fast cell's step.
        from insarseg.models.registry import build
        from insarseg.train import engine as tengine

        model_f32 = build(model_name, "channel",
                          dtype=jnp.bfloat16 if bf16 else None)
        state = tengine.create_state(model_f32, jax.random.key(0),
                                     x[:batch])
        step = tengine.make_train_step(model_f32, num_classes=2)
        masks = jnp.asarray(
            rng.integers(0, 2, (batch, tile, tile)).astype(np.int32))
        key = jax.random.key(1)

        holder = {"state": state}

        def run(im):
            # the jitted step donates the state buffers — thread the new
            # state through so repeated profiling calls stay valid (but not
            # while being traced for the HLO dump: keeping a tracer would
            # leak it into the next real call)
            new_state, out = step(holder["state"], im, masks, key)
            if not isinstance(out["loss"], jax.core.Tracer):
                holder["state"] = new_state
            return out["loss"]

        # HLO for the metadata join must come from the INNER jitted step —
        # re-lowering the wrapper builds a different program whose fusion
        # names don't match the traced one (the round-5 first-pass train
        # tables were mostly '?' rows for this reason)
        run.lowered_hlo = (
            step.lower(state, x, masks, key).compile().as_text())
        return run, x
    raise SystemExit(f"unknown graph {graph!r}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", default="std",
                    choices=["std", "s2d", "int8", "train"])
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--bf16", action="store_true",
                    help="train graph: compute_dtype=bfloat16")
    ap.add_argument("--model", default="unet",
                    choices=["unet", "unet-fast"],
                    help="train graph: which flagship cell to step")
    ap.add_argument("--reanalyze", metavar="DIR", default=None,
                    help="re-join a saved trace dir (rows.json/hlo.txt "
                         "from a prior run) offline — no device needed")
    args = ap.parse_args()

    if args.reanalyze:
        with open(args.reanalyze + "/hlo.txt") as f:
            analyze(args.reanalyze, f.read(), args.iters)
        return

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/insarseg_jax_cache")
    predict, x = _build(args.graph, args.batch, args.tile, bf16=args.bf16,
                        model_name=args.model)

    def sync(o):
        return float(jnp.ravel(o.astype(jnp.float32))[0])

    sync(predict(x))  # compile
    hlo = getattr(predict, "lowered_hlo", None)
    if hlo is None:
        hlo = jax.jit(predict).lower(x).compile().as_text()

    trace_dir = tempfile.mkdtemp(prefix=f"trace_{args.graph}_")
    jax.profiler.start_trace(trace_dir)
    out = None
    for _ in range(args.iters):
        out = predict(x)
    sync(out)
    jax.profiler.stop_trace()
    print(f"trace: {trace_dir}")
    analyze(trace_dir, hlo, args.iters)


if __name__ == "__main__":
    main()
