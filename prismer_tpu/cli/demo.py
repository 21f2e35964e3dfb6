"""Demo captioning on a folder of images (reference: demo.py).

  python -m prismer_tpu.cli.demo --exp_name exp --pretrained <ckpt> \
      [--data_path helpers]

Expert labels must exist under <label_path>; run the expert generators first
(prismer_tpu.experts.generate, reference demo.py:26-49 shells out the same
way). Writes a .txt caption per image next to the inputs (demo.py:62-76)."""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from prismer_tpu.cli import common
from prismer_tpu.data import create_dataset, create_loader
from prismer_tpu.models import caption as caption_head


def main():
    p = common.base_parser("caption")
    p.set_defaults(target_dataset="demo")
    args = p.parse_args()
    config, cfg, model, tokenizer = common.setup(args, "caption")

    _, test_ds = create_dataset("caption", config)
    loader = create_loader(test_ds, batch_size=1, num_workers=4, train=False)

    state_vars = common.init_model_variables(model, cfg, seed=args.seed)
    if args.pretrained:
        state_vars = common.load_pretrained(args.pretrained, cfg, state_vars)

    gen_fn = caption_head.build_generate_fn(model)
    from prismer_tpu.models.prismer import prepare_serving_variables
    state_vars = prepare_serving_variables(model, state_vars)
    prefix = config.get("prefix", "")
    for batch in loader:
        ids, mask = caption_head.prefix_prompt_ids(tokenizer, prefix, 1)
        seqs = gen_fn(state_vars,
                      common.experts_to_device(batch["experts"]),
                      jnp.asarray(ids), jnp.asarray(mask))
        cap = caption_head.decode_captions(np.asarray(seqs), tokenizer,
                                           prefix)[0]
        img_path = test_ds.data_list[batch["index"][0]]["image"]
        out_path = os.path.splitext(img_path)[0] + ".txt"
        with open(out_path, "w") as f:
            f.write(cap)
        print(f"{img_path}: {cap}")


if __name__ == "__main__":
    main()
