import numpy as np

from crog_tpu.utils.tokenizer import get_tokenizer, tokenize

# Golden token ids validated against the reference CLIP SimpleTokenizer
# (utils/simple_tokenizer.py) on 2026-08-16.
GOLDEN = {
    "a photo of a cat": [320, 1125, 539, 320, 2368],
    "Pick up the red mug next to the cereal box.": [
        3142, 705, 518, 736, 9722, 1131, 531, 518, 17581, 2063, 269,
    ],
    "grasp the leftmost banana": [34975, 518, 33949, 1096, 8922],
    "the   white keyboard, please!": [518, 1579, 13017, 267, 1474, 256],
    "don't touch the knife's edge": [847, 713, 4526, 518, 8960, 568, 5461],
}


def test_golden_tokens():
    tok = get_tokenizer()
    for text, ids in GOLDEN.items():
        assert tok.encode(text)[: len(ids)] == ids[: len(tok.encode(text))]
        assert tok.encode(text) == ids


def test_special_tokens_and_vocab():
    tok = get_tokenizer()
    assert tok.sot_token == 49406
    assert tok.eot_token == 49407
    assert len(tok.encoder) == 49408


def test_tokenize_padding_and_truncation():
    out = tokenize("a photo of a cat", context_length=17)
    assert out.shape == (1, 17)
    assert out.dtype == np.int32
    assert out[0, 0] == 49406
    assert out[0, 6] == 49407
    assert out[0, 7:].sum() == 0

    long_text = "cat " * 40
    out = tokenize(long_text, context_length=17, truncate=True)
    assert out.shape == (1, 17)
    assert out[0, -1] == 49407  # truncation replaces last with EOT


def test_decode_roundtrip():
    tok = get_tokenizer()
    text = "grasp the blue bowl"
    assert tok.decode(tok.encode(text)).strip() == text
