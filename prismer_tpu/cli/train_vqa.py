"""VQA fine-tune / eval driver (reference: train_vqa.py).

  python -m prismer_tpu.cli.train_vqa --exp_name exp [--evaluate] ...

Eval writes /results/vqa_results_{exp}.json in the EvalAI submission format
(train_vqa.py:165-173): [{'question_id': int, 'answer': str}].
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from prismer_tpu.cli import common
from prismer_tpu.data import create_dataset, create_loader
from prismer_tpu.models import caption as caption_head
from prismer_tpu.models import vqa as vqa_head
from prismer_tpu.train import build_train_step
from prismer_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from prismer_tpu.train.schedules import per_step_cosine


def prepare_train_batch(batch, tokenizer):
    ids, mask, targets = vqa_head.vqa_training_batch(
        tokenizer, batch["question"], batch["answer"])
    return {
        "experts": common.experts_to_device(batch["experts"]),
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.asarray(mask),
        "targets": jnp.asarray(targets),
        "weights": jnp.asarray(np.asarray(batch["weight"], np.float32)),
    }


def main():
    args = common.base_parser("vqa").parse_args()
    config, cfg, model, tokenizer = common.setup(args, "vqa", keyed=False)

    train_ds, test_ds = create_dataset("vqa", config)
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
    ckpt_dir = os.path.join(args.logging_dir, f"vqa_{args.exp_name}")
    start_epoch = 0
    if args.from_checkpoint and os.path.exists(ckpt_dir):
        state, meta = restore_checkpoint(os.path.join(ckpt_dir, "state"),
                                         state)
        start_epoch = int(meta.get("epoch", -1)) + 1

    step_fn = build_train_step(model, tx, freeze_tree=labels)

    if not args.evaluate:
        t0 = time.time()
        for epoch in range(start_epoch, config["max_epoch"]):
            losses = []
            for batch in train_loader:
                state, metrics = step_fn(state,
                                         prepare_train_batch(batch, tokenizer))
                losses.append(float(metrics["loss"]))
            print(f"Epoch {epoch:03d} | loss "
                  f"{np.mean(losses) if losses else 0:.4f} | "
                  f"{time.time() - t0:.0f}s")
            save_checkpoint(os.path.join(ckpt_dir, "state"), state,
                            {"epoch": epoch})

    # -- eval: rank or generate over the answer list (train_vqa.py:142-173)
    answer_list = test_ds.answer_list
    results = []
    if config.get("inference", "rank") == "rank":
        ans_ids, ans_mask = caption_head.tokenize_answer_list(
            tokenizer, answer_list, lowercase=False)
        rank_fn = caption_head.build_rank_fn(model,
                                             k_test=config.get("k_test", 128))
        for batch in test_loader:
            q_ids, q_mask = vqa_head.tokenize_questions(tokenizer,
                                                        batch["question"])
            best = rank_fn(state.variables,
                           common.experts_to_device(batch["experts"]),
                           jnp.asarray(q_ids), jnp.asarray(q_mask),
                           jnp.asarray(ans_ids), jnp.asarray(ans_mask))
            for qid, idx in zip(batch["question_id"], np.asarray(best)):
                results.append({"question_id": int(qid),
                                "answer": answer_list[int(idx)]})
    else:
        for batch in test_loader:
            answers = vqa_head.generate_answers(
                model, state.variables,
                common.experts_to_device(batch["experts"]), tokenizer,
                batch["question"])
            for qid, ans in zip(batch["question_id"], answers):
                results.append({"question_id": int(qid), "answer": ans})

    all_results = common.gather_results(results)
    if common.is_main_process():
        path = common.dump_results(all_results, args.results_dir,
                                   f"vqa_results_{args.exp_name}.json")
        print(f"wrote {path} ({len(all_results)} answers) — submit to EvalAI")


if __name__ == "__main__":
    main()
