"""Pretrain the in-repo TinyTransformer sentence encoder and write its
weights to pixeltable_spark/models/weights/tiny_encoder_v1.npz.

Pretraining corpus: the deterministic in-repo seed sentences
(operators/langid_seed.py, Latin-script languages — the tokenizer is
[a-z0-9]-based). Fully reproducible: fixed seeds, fixed epoch count.
Run: python tools/train_tiny_encoder.py
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pixeltable_spark.models.tiny_transformer import (TinyTransformer,
                                                      build_vocab)
from pixeltable_spark.operators.langid_seed import TEST, TRAIN

OUT = os.path.join(ROOT, "pixeltable_spark", "models", "weights",
                   "tiny_encoder_v1.npz")
LATIN = ("en", "de", "fr", "es", "it", "pt", "nl")


def main() -> None:
    texts = [t for lg in LATIN for t in TRAIN[lg] + TEST[lg]]
    vocab = build_vocab(texts, max_size=4000)
    print(f"corpus {len(texts)} sentences, vocab {len(vocab)}")
    m = TinyTransformer(vocab, dim=48, n_layers=2, n_heads=4,
                        max_len=32, seed=0)
    losses = m.train_mlm(texts, epochs=400, lr=3e-3, mask_frac=0.3,
                         seed=1, verbose=True)
    print(f"final MLM loss {losses[-1]:.4f}")
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    m.save(OUT)
    print(f"wrote {OUT} ({os.path.getsize(OUT)/1024:.0f} KiB)")


if __name__ == "__main__":
    main()
