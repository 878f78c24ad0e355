"""Special-token constants shared across the framework.

Vanilla vocabulary ids match the reference's offline prep
(/root/reference/generate_json_data.py:44-48): the word dict is built with
`<start>=0, <eos>=1, <unk>=2, <pad>=3`.

BERT ids are the fixed `bert-base-uncased` vocabulary ids; the reference
obtains them from a live tokenizer (reference decoder.py:21-36), but they are
stable constants of the released vocab, so we pin them and stay functional
without network access.
"""

# Vanilla word_dict special tokens (generate_json_data.py:44-48)
START = 0
EOS = 1
UNK = 2
PAD = 3

# bert-base-uncased special token ids
BERT_PAD = 0
BERT_CLS = 101  # used as BOS (reference train.py:56)
BERT_SEP = 102  # used as EOS (reference train.py:57)
BERT_VOCAB_SIZE = 30522
BERT_HIDDEN_SIZE = 768

# Beam-search completion sets. The reference's beam treats these ids as
# sentence terminators (reference decoder.py:224-229):
#  - vanilla: next_word in {1, 102}  (<eos>, plus the stray 102 kept verbatim)
#  - bert:    next_word in {1, 0}    ("quickfix" for SEP-after-PAD data prep)
BEAM_STOP_VANILLA = (1, 102)
BEAM_STOP_BERT = (1, 0)

# Hard cap on beam-search steps (reference decoder.py:252-253). The
# reference's `while` loop executes its body once more after step==50 before
# breaking, i.e. at most 51 expansion steps.
BEAM_MAX_STEPS = 51

# Caption token budget used by data prep (generate_json_data.py:89-90).
MAX_CAPTION_LENGTH = 25

# ImageNet normalization used by every encoder (reference train.py:27-32).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
IMAGE_SIZE = 224
