"""Weight conversion CLI — the offline counterpart of the reference's
download_checkpoints.py (which pulls 7 expert weights + 12 model checkpoints
from the hub; no egress here, so users supply the files and this converts
them all to flat .npz param trees):

  python -m prismer_tpu.convert.cli --kind prismer \
      --src logging/pretrain_x/pytorch_model.bin --dst pretrain_x.npz \
      --prismer_model prismer_base --experts full --image_resolution 224

  python -m prismer_tpu.convert.cli --kind clip_vision --src ViT-B-16.pt ...
  python -m prismer_tpu.convert.cli --kind roberta --src roberta-base.bin ...
  python -m prismer_tpu.convert.cli --kind {dpt,nnet,dexined,charnet,
                                            mask2former,clip_text} ...
"""

from __future__ import annotations

import argparse

FULL_EXPERTS = ["depth", "normal", "seg_coco", "edge", "obj_detection",
                "ocr_detection"]


def _load_sd(path: str):
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"],
                                                               dict):
        obj = obj["model"]
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return obj


def _save(tree, dst: str):
    from prismer_tpu.train.checkpoint import save_params_npz
    if "params" in tree and isinstance(tree["params"], dict):
        save_params_npz(dst, tree)
    else:
        save_params_npz(dst, {"params": tree})
    print(f"wrote {dst}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", required=True,
                    choices=["prismer", "clip_vision", "roberta", "dpt",
                             "nnet", "dexined", "charnet", "mask2former",
                             "unidet", "clip_text"])
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--prismer_model", default="prismer_base")
    ap.add_argument("--experts", default="full",
                    help="'full', 'none', or comma-separated list")
    ap.add_argument("--image_resolution", type=int, default=224)
    args = ap.parse_args()

    sd = _load_sd(args.src)

    if args.kind in ("prismer", "clip_vision", "roberta"):
        from prismer_tpu.config import build_prismer_config
        experts = (FULL_EXPERTS if args.experts == "full"
                   else "none" if args.experts == "none"
                   else args.experts.split(","))
        cfg = build_prismer_config({
            "experts": experts, "image_resolution": args.image_resolution,
            "prismer_model": args.prismer_model, "freeze": "none"})
        from prismer_tpu.convert import torch_to_jax as cv
        if args.kind == "prismer":
            tree = cv.convert_prismer_checkpoint(sd, cfg)
        elif args.kind == "clip_vision":
            tree = {"expert_encoder": cv.convert_clip_vision(sd, cfg)}
        else:
            tree = {"text_decoder": cv.convert_hf_roberta_mlm(
                sd, cfg.decoder.num_hidden_layers)}
        _save(tree, args.dst)
        return

    from prismer_tpu.convert import experts as cve
    if args.kind == "dpt":
        _save(cve.convert_dpt(sd), args.dst)
    elif args.kind == "nnet":
        _save(cve.convert_nnet(sd), args.dst)
    elif args.kind == "dexined":
        _save(cve.convert_dexined(sd), args.dst)
    elif args.kind == "charnet":
        _save(cve.convert_charnet(sd), args.dst)
    elif args.kind == "mask2former":
        _save(cve.convert_mask2former(sd), args.dst)
    elif args.kind == "unidet":
        _save(cve.convert_unidet(sd), args.dst)
    elif args.kind == "clip_text":
        from prismer_tpu.experts.clip_text import convert_clip_text
        _save(convert_clip_text(sd), args.dst)


if __name__ == "__main__":
    main()
