#!/usr/bin/env python
"""Full-size converted-checkpoint Dice rehearsal (VERDICT r1 item 1).

Real-data Dice parity is blocked on the private corpus + OneDrive ckpt;
this rehearsal proves the full-size mechanical chain TODAY: build the
2048-ch torch twin (random init, seeded), convert its state dict, load it
into the Trainer, and run the reference eval protocol (`evaluate_clips`)
over the synthetic test clips. Publishes the Dice rows for BASELINE.md.

    python tools/full_size_rehearsal.py [--platform cpu|tpu] [--dtype bfloat16]

When the released checkpoint exists, tools/parity_check.py does the same
with real weights/data.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import dataclasses

    import torch

    from glfusion_tpu.config import Config
    from glfusion_tpu.utils.torch_convert import convert_state_dict
    from glfusion_tpu.utils.torch_twin import TGlobalAndLocal

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, dtype=args.dtype))

    print("[rehearsal] building full-size torch twin (random init, "
          f"seed {args.seed})", flush=True)
    torch.manual_seed(args.seed)
    t0 = time.time()
    tmodel = TGlobalAndLocal(dataclasses.replace(
        cfg.model, aspp_dropout=0.0)).eval()
    n_params = sum(p.numel() for p in tmodel.parameters())
    print(f"[rehearsal] twin built: {n_params / 1e6:.1f}M params "
          f"({time.time() - t0:.1f}s)", flush=True)

    t0 = time.time()
    converted = convert_state_dict(tmodel.state_dict(), cfg.model)
    print(f"[rehearsal] state dict converted ({time.time() - t0:.1f}s)",
          flush=True)
    del tmodel

    from glfusion_tpu.train.trainer import Trainer

    trainer = Trainer(cfg, data_paths=None)  # synthetic corpus
    trainer.state = trainer.state.replace(
        params=jax.device_put(converted["params"]),
        batch_stats=jax.device_put(converted["batch_stats"]))
    print("[rehearsal] converted params loaded into Trainer; evaluating "
          "the 10 synthetic test clips (reference protocol)", flush=True)
    t0 = time.time()
    results = trainer.validation_and_test()
    dt = time.time() - t0
    out = {"dtype": args.dtype, "params_m": round(n_params / 1e6, 1),
           "eval_seconds": round(dt, 1)}
    for split, rep in results.items():
        out[split] = {view: round(r["dice"], 4)
                      for view, r in rep["views"].items()}
    print("REHEARSAL " + json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
