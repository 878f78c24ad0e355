#!/usr/bin/env python
"""Offline pretrained-weight porter: torchvision checkpoint -> sat_tpu .npz.

Run this wherever the torchvision pretrained files exist (they cannot be
downloaded inside the zero-egress TPU environment; the reference instead
downloads them at Encoder construction, reference encoder.py:14-24):

    # On a machine with torchvision + network:
    python -c "import torchvision, torch; \
        torch.save(torchvision.models.vgg19(weights='DEFAULT').state_dict(), 'vgg19.pth')"

    # Anywhere with this repo + torch:
    python tools/port_torchvision.py --network vgg19 \
        --state-dict vgg19.pth --out vgg19_imagenet.npz

Then train/serve with `--encoder-weights vgg19_imagenet.npz`.

Also exports the frozen BERT input-embedding table for `--bert` runs:

    python tools/port_torchvision.py --bert-embeddings bert_model_dir_or_name \
        --out bert_embeddings.npy
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def port_encoder(network: str, state_dict_path: str, out_path: str) -> None:
    import torch
    from sat_tpu.compat.torch_encoder import (
        encoder_params_from_state_dict,
        save_encoder_npz,
    )
    sd = torch.load(state_dict_path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params = encoder_params_from_state_dict(network, sd)
    save_encoder_npz(out_path, params)
    print(f"wrote {out_path}")


def export_bert_embeddings(model_name: str, out_path: str) -> None:
    import numpy as np
    from transformers import BertModel
    model = BertModel.from_pretrained(model_name)
    table = model.get_input_embeddings().weight.detach().cpu().numpy()
    assert table.shape == (30522, 768), table.shape
    np.save(out_path, table)
    print(f"wrote {out_path} {table.shape}")


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--network",
                        choices=["vgg19", "resnet152", "densenet161"])
    parser.add_argument("--state-dict", type=str,
                        help="torchvision model state_dict .pth")
    parser.add_argument("--bert-embeddings", type=str,
                        help="HF model name/dir to export input embeddings from")
    parser.add_argument("--out", type=str, required=True)
    args = parser.parse_args()

    if args.bert_embeddings:
        export_bert_embeddings(args.bert_embeddings, args.out)
    elif args.network and args.state_dict:
        port_encoder(args.network, args.state_dict, args.out)
    else:
        parser.error("need either --network + --state-dict, or --bert-embeddings")


if __name__ == "__main__":
    main()
