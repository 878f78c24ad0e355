"""Host-side evaluation helpers: token-to-word decoding and corpus BLEU.

Decoding semantics are copied behaviorally from the reference
(train.py:249-299): stop at the first EOS, skip start/pad, and — in BERT
mode — reassemble WordPiece tokens before splitting. BLEU is NLTK
`corpus_bleu` with the reference's exact calls and weights
(train.py:330-333), computed over *teacher-forced argmax* hypotheses
against all per-image references, because the published baselines were
measured that way.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

from sat_tpu import constants


def build_token_dict(word_dict: Dict[str, int]) -> Dict[int, str]:
    return {idx: word for word, idx in word_dict.items()}


def decode_caption(caption: Sequence[int], word_dict: Dict[str, int],
                   token_dict: Dict[int, str] | None = None) -> List[str]:
    """Vanilla decode (reference train.py:277-285)."""
    if token_dict is None:
        token_dict = build_token_dict(word_dict)
    eos, start, pad = word_dict["<eos>"], word_dict["<start>"], word_dict["<pad>"]
    sentence = []
    for word_idx in caption:
        word_idx = int(word_idx)
        if word_idx == eos:
            break
        if word_idx not in (start, pad):
            sentence.append(token_dict[word_idx])
    return sentence


def decode_caption_bert(caption: Sequence[int], tokenizer) -> List[str]:
    """BERT decode (reference train.py:250-260): stop at [SEP], skip
    [CLS]/[PAD], then convert_tokens_to_string().split()."""
    tokens = tokenizer.convert_ids_to_tokens([int(c) for c in caption])
    sentence = []
    for token in tokens:
        if token == "[SEP]":
            break
        if token not in ("[CLS]", "[PAD]"):
            sentence.append(token)
    return tokenizer.convert_tokens_to_string(sentence).split()


def compute_bleu(decoded_all_captions, decoded_hypotheses) -> dict:
    """BLEU-1..4 with the reference's exact corpus_bleu invocations
    (train.py:330-333), NLTK warnings and all."""
    from nltk.translate.bleu_score import corpus_bleu
    return {
        "bleu1": corpus_bleu(decoded_all_captions, decoded_hypotheses,
                             weights=(1, 0, 0, 0)),
        "bleu2": corpus_bleu(decoded_all_captions, decoded_hypotheses,
                             weights=(0.5, 0.5, 0, 0)),
        "bleu3": corpus_bleu(decoded_all_captions, decoded_hypotheses,
                             weights=(0.33, 0.33, 0.33, 0)),
        "bleu4": corpus_bleu(decoded_all_captions, decoded_hypotheses),
    }
