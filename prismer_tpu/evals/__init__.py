from prismer_tpu.evals.bleu import corpus_bleu
from prismer_tpu.evals.cider import CiderD
from prismer_tpu.evals.coco_eval import coco_caption_eval

__all__ = ["CiderD", "corpus_bleu", "coco_caption_eval"]
