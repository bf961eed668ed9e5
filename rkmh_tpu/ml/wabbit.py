"""VW-format linear models on device — the framework's `vw` stand-in.

The reference's ML extension trains/applies Vowpal Wabbit models over
rkmh classification vectors (scripts/train_the_wabbit.sh: ``vw
--passes=25 --binary --interactions vvvv -f model``; applied in
model_docker/run_models.sh:3-10).  The vw binary is an external
dependency; this module implements the pipeline's contract natively so
train -> apply -> conf_mat runs anywhere the framework runs:

* input: VW example lines (``label [imp] ['tag] |ns f:v f ...``) — the
  exact output of rkmh-tpu-vwize / `hash -w`;
* features: hashed to ``2**bits`` slots (murmur3, seed 42 — the
  framework's canonical hash), namespace-salted; ``--interactions``
  expands n-way namespace products like vw does;
* models: binary logistic (±1 labels, margin predictions) and one-vs-
  all multiclass (the ``--ect k`` use case; class-id predictions);
  trained full-batch with optax adam under jit — gather + segment-sum
  sparse matvec, so sketch-sized vectors stay device-friendly;
* output: one prediction per input line (raw margin / class id), the
  format conf_mat.py / interpret_wabbit consume.

Deliberate differences from vw (documented, not bugs): NEW models are
saved as npz, and the online-learning schedule is replaced by
full-batch adam, so learned weights differ while the interface and
separability behavior match.  vw's own binary ``.model`` files — the
reference's 4 shipped model_docker blobs included — are READ natively
(ml/vw_model.py parses the 8.3.1 regressor format and applies vw's own
feature hashing), so ``-i blob.model -t -p out`` works without a vw
binary.
"""

from __future__ import annotations

import argparse
import sys
from dataclasses import dataclass
from itertools import product

import numpy as np

from rkmh_tpu.ops.murmur3 import murmur3_x64_128_np


# ---------------------------------------------------------------------------
# VW text format
# ---------------------------------------------------------------------------


@dataclass
class Example:
    label: float | None
    importance: float
    tag: str
    namespaces: list  # [(ns_name, [(feat, val), ...])]


def parse_example(line: str) -> Example | None:
    line = line.rstrip("\n")
    if not line.strip():
        return None
    head, *nss = line.split("|")
    toks = head.split()
    label = importance = None
    tag = ""
    pos = 0  # positional: token 0 = label, token 1 = importance
    for t in toks:
        if t.startswith("'"):
            tag = t[1:]
            continue
        if pos == 0:
            try:
                label = float(t)
            except ValueError:
                label = None  # unlabeled (e.g. the XYX placeholder)
        elif pos == 1:
            try:
                importance = float(t)
            except ValueError:
                pass
        pos += 1
    # a quoted tag may be glued to the last token (vwize: `1.0 'tag`)
    if not tag and toks and "'" in toks[-1]:
        tag = toks[-1].split("'", 1)[1]
    namespaces = []
    for ns in nss:
        parts = ns.split()
        if not parts:
            continue
        # "name f:v ..." — a namespace token has no ':'; a bare feature does
        if ":" not in parts[0] or parts[0].endswith(":"):
            ns_name, feats = parts[0], parts[1:]
        else:
            ns_name, feats = "", parts
        fv = []
        for f in feats:
            if ":" in f:
                name, v = f.rsplit(":", 1)
                try:
                    fv.append((name, float(v)))
                except ValueError:
                    fv.append((f, 1.0))
            else:
                fv.append((f, 1.0))
        namespaces.append((ns_name, fv))
    return Example(label, importance if importance is not None else 1.0,
                   tag, namespaces)


def _hash_feat(s: str, bits: int) -> int:
    h, _ = murmur3_x64_128_np(s.encode())
    return h & ((1 << bits) - 1)


def example_features(ex: Example, bits: int, interactions: list[str],
                     ignore: set[str]) -> list[tuple[int, float]]:
    """Hashed (index, value) features incl. namespace interactions.

    `interactions` entries are vw-style namespace-first-letter strings
    ("vvvv" = 4-way product of namespaces starting with 'v')."""
    spaces = [(n, fv) for n, fv in ex.namespaces
              if not (n[:1] in ignore)]
    out = []
    for ns_name, fv in spaces:
        for name, val in fv:
            out.append((_hash_feat(f"{ns_name}^{name}", bits), val))
    for spec in interactions:
        slots = []
        for ch in spec:
            cand = [fv for n, fv in spaces if n[:1] == ch]
            slots.append([f for fv in cand for f in fv])
        n_combo = 1
        for s in slots:
            n_combo *= max(1, len(s))
        if n_combo > 2_000_000:
            raise ValueError(
                f"interaction {spec!r} expands to {n_combo} features/example"
            )
        if any(not s for s in slots):
            continue
        for combo in product(*slots):
            key = "*".join(name for name, _ in combo)
            val = 1.0
            for _, v in combo:
                val *= v
            out.append((_hash_feat(f"I{spec}^{key}", bits), val))
    return out


def vectorize(examples, bits: int, interactions, ignore):
    """Examples -> padded (idx [N, F] i32, val [N, F] f32) + labels."""
    rows = [example_features(ex, bits, interactions, ignore) for ex in examples]
    F = max(1, max((len(r) for r in rows), default=1))
    idx = np.zeros((len(rows), F), np.int32)
    val = np.zeros((len(rows), F), np.float32)
    for i, r in enumerate(rows):
        for j, (ix, v) in enumerate(r):
            idx[i, j] = ix
            val[i, j] = v
    labels = np.asarray(
        [ex.label if ex.label is not None else 0.0 for ex in examples],
        np.float32,
    )
    return idx, val, labels


# ---------------------------------------------------------------------------
# Models (jax + optax)
# ---------------------------------------------------------------------------


def _margins(w, idx, val):
    import jax.numpy as jnp

    return jnp.sum(w[idx] * val, axis=-1)  # [N] (or [C, N] under vmap)


def train_binary(idx, val, y, bits: int, passes: int = 25, lr: float = 0.05):
    """Full-batch adam logistic regression; y in {-1, +1}; returns w [2^b]."""
    import jax
    import jax.numpy as jnp
    import optax

    D = 1 << bits

    def loss(w):
        m = _margins(w, idx, val)
        return jnp.mean(jnp.logaddexp(0.0, -y * m)) + 1e-6 * jnp.sum(w * w)

    opt = optax.adam(lr)
    w = jnp.zeros((D,), jnp.float32)
    state = opt.init(w)

    @jax.jit
    def step(w, state):
        g = jax.grad(loss)(w)
        updates, state = opt.update(g, state)
        return optax.apply_updates(w, updates), state

    for _ in range(max(1, passes)):
        w, state = step(w, state)
    return np.asarray(w)


def train_multiclass(idx, val, y, n_classes: int, bits: int,
                     passes: int = 25, lr: float = 0.05):
    """One-vs-all logistic (the --ect use case); y in {1..k}; W [k, 2^b]."""
    import jax
    import jax.numpy as jnp
    import optax

    D = 1 << bits
    Y = np.zeros((n_classes, len(y)), np.float32) - 1.0
    for i, lab in enumerate(y):
        Y[int(lab) - 1, i] = 1.0
    Y = jnp.asarray(Y)

    # vmapped binary losses share one adam state
    def loss_all(W):
        m = jax.vmap(lambda w: _margins(w, idx, val))(W)  # [C, N]
        return jnp.mean(jnp.logaddexp(0.0, -Y * m)) + 1e-6 * jnp.sum(W * W)

    opt = optax.adam(lr)
    W = jnp.zeros((n_classes, D), jnp.float32)
    state = opt.init(W)

    @jax.jit
    def step(W, state):
        g = jax.grad(loss_all)(W)
        updates, state = opt.update(g, state)
        return optax.apply_updates(W, updates), state

    for _ in range(max(1, passes)):
        W, state = step(W, state)
    return np.asarray(W)


def save_model(path: str, kind: str, weights, bits: int, interactions, ignore):
    # write through a file object: np.savez would otherwise append .npz to
    # the name, breaking `-f trained.model`-style invocations
    with open(path, "wb") as fh:
        np.savez_compressed(
            fh, kind=kind, weights=weights, bits=bits,
            interactions=np.asarray(list(interactions), dtype=object),
            ignore=np.asarray(sorted(ignore), dtype=object),
        )


def load_model(path: str):
    z = np.load(path, allow_pickle=True)
    return (str(z["kind"]), z["weights"], int(z["bits"]),
            [str(s) for s in z["interactions"]],
            {str(s) for s in z["ignore"]})


# ---------------------------------------------------------------------------
# CLI — the vw-flag subset the reference pipeline uses
# ---------------------------------------------------------------------------


def main(argv=None, stdin=None, stdout=None) -> int:
    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout
    ap = argparse.ArgumentParser(
        prog="rkmh-tpu-wabbit",
        description="vw-compatible train/predict over VW example lines "
                    "(jax; npz models).",
    )
    ap.add_argument("data", nargs="?", default="-",
                    help="VW examples file ('-' = stdin)")
    ap.add_argument("-d", "--data", dest="data_flag", default=None)
    ap.add_argument("-f", "--final-regressor", dest="out_model", default="")
    ap.add_argument("-i", "--initial-regressor", dest="in_model", default="")
    ap.add_argument("-p", "--predictions", default="",
                    help="write predictions here ('/dev/stdout' works)")
    ap.add_argument("-t", "--testonly", action="store_true")
    ap.add_argument("--binary", action="store_true")
    ap.add_argument("--ect", type=int, default=0, metavar="K",
                    help="K-way multiclass (one-vs-all)")
    ap.add_argument("--passes", type=int, default=25)
    ap.add_argument("-b", "--bit-precision", dest="bits", type=int, default=18)
    ap.add_argument("--interactions", action="append", default=[])
    ap.add_argument("--ignore", action="append", default=[])
    ap.add_argument("--learning-rate", type=float, default=0.05)
    ap.add_argument("--cache_file", default="", help="accepted, unused")
    args = ap.parse_args(argv)

    import rkmh_tpu  # noqa: F401  (x64 / platform pinning)

    path = args.data_flag or args.data
    fh = stdin if path == "-" else open(path)
    try:
        examples = [e for e in (parse_example(l) for l in fh) if e is not None]
    finally:
        if path != "-":
            fh.close()
    if not examples:
        print("no examples", file=sys.stderr)
        return 1

    if args.in_model:
        from rkmh_tpu.ml.vw_model import is_vw_model

        if is_vw_model(args.in_model):
            # a REAL vw binary model (e.g. the reference's 4 shipped
            # model_docker blobs): vw-native hashing + predict
            # (ml/vw_model.py); apply-only — training continues a model
            # vw-side, which this stand-in does not do
            from rkmh_tpu.ml.vw_model import load_vw_model, predict_examples

            if args.out_model:
                print("vw binary models are apply-only here (pass -t -p; "
                      "train new models to npz instead)", file=sys.stderr)
                return 1
            model = load_vw_model(args.in_model)
            preds_out = (stdout if args.predictions in ("-", "/dev/stdout")
                         else open(args.predictions, "w")
                         if args.predictions else None)
            if preds_out is None:
                print("vw binary model loaded; nothing to do without -p",
                      file=sys.stderr)
                return 0
            try:
                for v in predict_examples(model, examples,
                                          binary=args.binary):
                    if model.kind == "ect":
                        preds_out.write(f"{int(v)}\n")
                    else:
                        preds_out.write(f"{v:.6f}\n")
            finally:
                if preds_out is not stdout:
                    preds_out.close()
            return 0
        kind, weights, bits, interactions, ignore = load_model(args.in_model)
    else:
        kind = "ect" if args.ect else "binary"
        bits, interactions, ignore = args.bits, args.interactions, set(args.ignore)
        weights = None

    idx, val, labels = vectorize(examples, bits, interactions, set(ignore))

    if weights is None and not args.testonly:
        # train only on labeled examples (vwize's unlabeled placeholder
        # lines would otherwise silently skew the model)
        labeled = np.asarray([ex.label is not None for ex in examples])
        if not labeled.all():
            print(f"skipping {int((~labeled).sum())} unlabeled examples "
                  "for training", file=sys.stderr)
        if not labeled.any():
            print("no labeled examples to train on", file=sys.stderr)
            return 1
        t_idx, t_val, t_lab = idx[labeled], val[labeled], labels[labeled]
        if kind == "binary":
            y = np.where(t_lab >= 0, 1.0, -1.0).astype(np.float32)
            weights = train_binary(t_idx, t_val, y, bits, args.passes,
                                   args.learning_rate)
        else:
            if not np.isin(t_lab, np.arange(1, args.ect + 1)).all():
                print(f"--ect {args.ect}: labels must be in 1..{args.ect}",
                      file=sys.stderr)
                return 1
            weights = train_multiclass(t_idx, t_val, t_lab, args.ect, bits,
                                       args.passes, args.learning_rate)
        if args.out_model:
            save_model(args.out_model, kind, weights, bits,
                       interactions, ignore)

    if weights is None and (args.testonly or args.predictions):
        print("no model: pass -i <model> (or drop -t to train)", file=sys.stderr)
        return 1

    preds_out = None
    if args.predictions:
        preds_out = (stdout if args.predictions in ("-", "/dev/stdout")
                     else open(args.predictions, "w"))
    if preds_out is not None:
        try:
            W = np.asarray(weights)
            if kind == "binary":
                m = (W[idx] * val).sum(axis=1)
                if args.binary:
                    for v in m:
                        preds_out.write(f"{1 if v > 0 else -1}\n")
                else:
                    for v in m:
                        preds_out.write(f"{v:.6f}\n")
            else:
                scores = np.stack([(W[c][idx] * val).sum(axis=1)
                                   for c in range(W.shape[0])])
                for c in scores.argmax(axis=0) + 1:
                    preds_out.write(f"{c}\n")
        finally:
            if preds_out is not stdout:
                preds_out.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
