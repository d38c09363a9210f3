"""CLI — train / evaluate / infer, mirroring the reference driver
(`scene_graph_prediction/main.py:36-124`) with one binary instead of four
conda envs.

  python -m or4d_tpu.cli train    --config no_gt
  python -m or4d_tpu.cli evaluate --config no_gt --checkpoint-dir ckpts
  python -m or4d_tpu.cli infer    --config no_gt --checkpoint-dir ckpts \
      --split test  # writes scan_relations_{config}_{split}.json

Inference output format is the reference interchange contract consumed by
role prediction and phase recognition (main.py:111-115).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import numpy as np

from or4d_tpu.config import load_config
from or4d_tpu.data.dataset import ORDataset
from or4d_tpu.data.vocab import DEFAULT_VOCAB
from or4d_tpu.train.loop import Trainer


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="or4d_tpu", description=__doc__)
    p.add_argument("mode", choices=["train", "evaluate", "infer"])
    p.add_argument("--config", default="no_gt", help="builtin config name or JSON path")
    p.add_argument("--data-root", default="data")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--split", default=None, help="infer/evaluate split (default: val for evaluate, test for infer)")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--limit", type=int, default=None, help="limit scans (smoke runs)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output", default=None, help="infer output json path")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    cfg = load_config(args.config)
    vocab = DEFAULT_VOCAB
    print(f"devices: {jax.devices()}")

    train_ds = ORDataset(cfg, "train", vocab, data_root=args.data_root)
    w_obj, w_rel = train_ds.weights()
    trainer = Trainer(cfg, vocab, w_obj, w_rel)
    batch_size = args.batch_size or cfg.tpu.scene_batch

    def init_or_restore():
        sample = next(train_ds.batches(batch_size))
        state = trainer.init_state(jax.random.key(args.seed), sample)
        if args.checkpoint_dir:
            from or4d_tpu.train import checkpoint as ckpt

            step = ckpt.latest_step(args.checkpoint_dir)
            if step is not None:
                print(f"restoring checkpoint step {step} from {args.checkpoint_dir}")
                state = ckpt.restore(args.checkpoint_dir, state)
        return state

    if args.mode == "train":
        val_ds = ORDataset(cfg, "val", vocab, data_root=args.data_root)
        state = init_or_restore()
        state, history = trainer.fit(
            state,
            train_batches=list(train_ds.batches(batch_size, shuffle=True, seed=args.seed, limit=args.limit)),
            val_batches=list(val_ds.batches(batch_size, limit=args.limit)),
            epochs=args.epochs,
            checkpoint_dir=args.checkpoint_dir,
        )
        print(json.dumps(history[-1]))
    elif args.mode == "evaluate":
        split = args.split or "val"
        eval_ds = ORDataset(cfg, split, vocab, data_root=args.data_root)
        state = init_or_restore()
        f1 = trainer.evaluate(state, eval_ds.batches(batch_size, limit=args.limit), verbose=True)
        print(json.dumps({"split": split, "relation_macro_f1": f1}))
    else:  # infer
        split = args.split or "test"
        eval_ds = ORDataset(cfg, split, vocab, data_root=args.data_root, for_eval=True)
        state = init_or_restore()
        scan_relations = trainer.predict_relations(state, eval_ds.batches(batch_size, limit=args.limit))
        out = args.output or f"scan_relations_{cfg.name}_{split}.json"
        Path(out).write_text(json.dumps(scan_relations))
        print(f"wrote {out} ({len(scan_relations)} scans)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
