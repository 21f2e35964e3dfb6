"""Few-shot ImageNet classification driver (reference:
train_classification.py): caption-model training on 'A photo of a <class>'
strings + rank inference over the class answer list, accuracy tracked with
best-checkpoint gating (train_classification.py:132-160)."""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from prismer_tpu.cli import common
from prismer_tpu.data import create_dataset, create_loader
from prismer_tpu.models import caption as caption_head
from prismer_tpu.train import build_train_step
from prismer_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from prismer_tpu.train.schedules import per_step_cosine


def main():
    args = common.base_parser("classification").parse_args()
    config, cfg, model, tokenizer = common.setup(args, "classification",
                                                 keyed=False)
    train_ds, test_ds = create_dataset("classification", config)
    train_loader = create_loader(train_ds, config["batch_size_train"],
                                 num_workers=8, train=True,
                                 shard_id=jax.process_index(),
                                 num_shards=jax.process_count())
    test_loader = create_loader(test_ds, config["batch_size_test"],
                                num_workers=8, train=False,
                                shard_id=jax.process_index(),
                                num_shards=jax.process_count())

    steps_per_epoch = max(len(train_loader), 1)
    schedule = per_step_cosine(config["init_lr"], config["min_lr"],
                               steps_per_epoch, config["max_epoch"])
    state, tx, labels, mesh = common.build_state(args, config, cfg, model,
                                                 schedule)
    ckpt_dir = os.path.join(args.logging_dir,
                            f"classification_{args.exp_name}")
    start_epoch = 0
    best_acc = 0.0
    if args.from_checkpoint and os.path.exists(ckpt_dir):
        state, meta = restore_checkpoint(os.path.join(ckpt_dir, "state"),
                                         state)
        start_epoch = int(meta.get("epoch", -1)) + 1
        best_acc = float(meta.get("best_acc", 0.0))

    prefix = config.get("prefix", "")
    prompt_len = caption_head.prefix_length(tokenizer, prefix)
    pad_id = cfg.decoder.pad_token_id
    step_fn = build_train_step(model, tx, freeze_tree=labels)
    rank_fn = caption_head.build_rank_fn(model,
                                         k_test=config.get("k_test", 32))
    # answers lowercased with prefix space (train_classification.py:139 uses
    # the caption rank path, prismer_caption.py:64)
    ans_ids, ans_mask = caption_head.tokenize_answer_list(
        tokenizer, test_ds.answer_list, lowercase=True)

    def eval_accuracy():
        correct = total = 0
        for batch in test_loader:
            b = len(batch["label"])
            ids, mask = caption_head.prefix_prompt_ids(tokenizer, prefix, b)
            best = rank_fn(state.variables,
                           common.experts_to_device(batch["experts"]),
                           jnp.asarray(ids), jnp.asarray(mask),
                           jnp.asarray(ans_ids), jnp.asarray(ans_mask))
            pred = np.asarray(best)
            want = np.asarray([int(l) for l in batch["label"]])
            correct += int((pred == want).sum())
            total += b
        agg = common.gather_results([{"c": correct, "t": total}])
        c = sum(r["c"] for r in agg)
        t = sum(r["t"] for r in agg)
        return c / max(t, 1)

    t0 = time.time()
    if not args.evaluate:
        for epoch in range(start_epoch, config["max_epoch"]):
            losses = []
            for batch in train_loader:
                enc = tokenizer(batch["caption"], padding="longest",
                                truncation=True, max_length=30)
                targets = np.where(enc.input_ids == pad_id, -100,
                                   enc.input_ids)
                targets[:, :prompt_len] = -100
                dev_batch = {
                    "experts": common.experts_to_device(batch["experts"]),
                    "input_ids": jnp.asarray(enc.input_ids),
                    "attention_mask": jnp.asarray(enc.attention_mask),
                    "targets": jnp.asarray(targets),
                }
                state, metrics = step_fn(state, dev_batch)
                losses.append(float(metrics["loss"]))
            acc = eval_accuracy()
            print(f"Epoch {epoch:03d} | loss "
                  f"{np.mean(losses) if losses else 0:.4f} | acc {acc:.4f} "
                  f"| {time.time() - t0:.0f}s")
            if acc > best_acc:
                best_acc = acc
                save_checkpoint(os.path.join(ckpt_dir, "state"), state,
                                {"epoch": epoch, "best_acc": best_acc})
    else:
        print(f"accuracy: {eval_accuracy():.4f}")


if __name__ == "__main__":
    main()
