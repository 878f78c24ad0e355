#!/usr/bin/env python
"""Export a sat_tpu decoder checkpoint as a reference-loadable .pth.

The reverse of the `.pth` import path (`sat_tpu/engine/checkpoint.py
load_decoder_checkpoint`): takes a per-epoch `model_<network>_<epoch>.npz`
(written by training, reference filename scheme per train.py:102-104) and
writes a torch state_dict file the reference's
`decoder.load_state_dict(torch.load(path))` accepts — so a model trained
on TPU drops back into the reference ecosystem (its generate_caption.py,
notebooks, W&B artifact flows) unchanged.

    python tools/export_reference_pth.py --model model/model_vgg19_8.npz \
        --out model_vgg19_8.pth

No model config is needed: the npz's slash-joined tree keys (see
checkpoint.py tree_save_npz) carry the full structure, including whether
the `ado` head exists.
"""

import argparse
import sys


def npz_to_tree(path: str) -> dict:
    """Rebuild the nested param dict from tree_save_npz's flat layout
    ("attention/U/w" -> tree["attention"]["U"]["w"])."""
    import numpy as np
    data = np.load(path)
    tree: dict = {}
    for name in data.files:
        parts = name.split("/")
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = data[name]
    return tree


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", type=str, required=True,
                        help="sat_tpu decoder checkpoint (.npz)")
    parser.add_argument("--out", type=str, required=True,
                        help="output torch state_dict (.pth)")
    args = parser.parse_args(argv)

    import torch

    from sat_tpu.compat import state_dict_from_decoder_params

    sd = state_dict_from_decoder_params(npz_to_tree(args.model))
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, args.out)
    print(f"wrote {args.out} ({len(sd)} tensors)")


if __name__ == "__main__":
    sys.exit(main())
