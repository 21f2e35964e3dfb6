"""Caption-objective pre-training driver (reference: train_pretrain.py).

Warmup LR for the first `warmup_steps` of epoch 0, per-epoch cosine after
(train_pretrain.py:110-120); freeze mode 'freeze_lang_vision' so only
adaptors + cross-attention + stems + resampler + embeddings train."""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from prismer_tpu.cli import common
from prismer_tpu.data import create_dataset, create_loader
from prismer_tpu.train import build_train_step
from prismer_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from prismer_tpu.train.schedules import pretrain_schedule


def main():
    args = common.base_parser("pretrain").parse_args()
    config, cfg, model, tokenizer = common.setup(args, "pretrain",
                                                 keyed=False)
    dataset = create_dataset("pretrain", config)
    loader = create_loader(dataset, config["batch_size_train"],
                           num_workers=8, train=True,
                           shard_id=jax.process_index(),
                           num_shards=jax.process_count())

    steps_per_epoch = max(len(loader), 1)
    schedule = pretrain_schedule(
        config["init_lr"], config["min_lr"], config["warmup_lr"],
        config["warmup_steps"], steps_per_epoch, config["max_epoch"])
    state, tx, labels, mesh = common.build_state(args, config, cfg, model,
                                                 schedule)
    ckpt_dir = os.path.join(args.logging_dir, f"pretrain_{args.exp_name}")
    start_epoch = 0
    if args.from_checkpoint and os.path.exists(ckpt_dir):
        state, meta = restore_checkpoint(os.path.join(ckpt_dir, "state"),
                                         state)
        start_epoch = int(meta.get("epoch", -1)) + 1

    pad_id = cfg.decoder.pad_token_id
    step_fn = build_train_step(model, tx, freeze_tree=labels)

    t0 = time.time()
    for epoch in range(start_epoch, config["max_epoch"]):
        losses = []
        for batch in loader:
            enc = tokenizer(batch["caption"], padding="longest",
                            truncation=True, max_length=30)
            targets = np.where(enc.input_ids == pad_id, -100, enc.input_ids)
            dev_batch = {
                "experts": common.experts_to_device(batch["experts"]),
                "input_ids": jnp.asarray(enc.input_ids),
                "attention_mask": jnp.asarray(enc.attention_mask),
                "targets": jnp.asarray(targets),
            }
            state, metrics = step_fn(state, dev_batch)
            losses.append(float(metrics["loss"]))
        print(f"Epoch {epoch:03d} | loss "
              f"{np.mean(losses) if losses else 0:.4f} | "
              f"{time.time() - t0:.0f}s")
        save_checkpoint(os.path.join(ckpt_dir, "state"), state,
                        {"epoch": epoch})


if __name__ == "__main__":
    main()
