#!/usr/bin/env python
"""Reference-checkpoint parity check (run when the private corpus + released
``.pth`` are available; SURVEY.md §7.3).

    python tools/parity_check.py --ckpt net_00088.pth --data-root /corpus \
        [--dump-activations acts.npz]

Loads the PyTorch checkpoint through the converter, runs the reference eval
protocol (fixed 10-clip split, sigmoid>0.5, overall + per-part Dice) and
prints the table to compare against the paper / a local PyTorch run. With
``--dump-activations`` it additionally saves every module's activations on
the first clip for layer-by-layer diffing (utils/activations.py).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="reference net_XXXXX.pth")
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--views", default="1,3,4")
    ap.add_argument("--dump-activations", default=None)
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from glfusion_tpu.config import Config
    from glfusion_tpu.train.trainer import Trainer
    from glfusion_tpu.utils.torch_convert import load_torch_checkpoint

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model,
                                       views=tuple(args.views.split(","))))
    root = Path(args.data_root)
    data_paths = {
        "infos": str(root / cfg.data.infos_path),
        "unlab_infos": str(root / cfg.data.unlab_infos_path),
        "test_infos": str(root / cfg.data.test_infos_path),
        "data_list_dir": str(root / cfg.data.data_list_dir),
    }
    trainer = Trainer(cfg, data_paths=data_paths)

    converted = load_torch_checkpoint(args.ckpt, cfg.model)
    trainer.state = trainer.state.replace(
        params=converted["params"], batch_stats=converted["batch_stats"])
    print(f"loaded + converted {args.ckpt}")

    if args.dump_activations:
        from glfusion_tpu.data.pipeline import TestClipLoader
        from glfusion_tpu.utils.activations import capture_activations

        loader = TestClipLoader(trainer.test_infos,
                                sorted(trainer.test_infos)[:1],
                                cfg.model.views, cfg.data.clip_length)
        clip = next(loader.clips())
        # first 2 frames only: every module's activation is materialized on
        # host, a full 40-frame clip would need several GB
        acts = capture_activations(
            trainer.model,
            {"params": converted["params"],
             "batch_stats": converted["batch_stats"]},
            jnp.asarray(clip["images"][:, :2]))
        np.savez(args.dump_activations, **acts)
        print(f"wrote {len(acts)} activations for clip "
              f"{clip['clip_id']} to {args.dump_activations}")

    results = trainer.validation_and_test()
    for split, rep in results.items():
        for view, m in rep["views"].items():
            print(f"{split} view {view}: Dice {m['dice']:.4f} "
                  f"parts {['%.3f' % p for p in m['part_dice']]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
