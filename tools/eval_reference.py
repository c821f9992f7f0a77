"""WER/CER parity evaluation against the reference's pretrained checkpoints.

Downloads a V3.0 release checkpoint (reference:
tests/pretrained_smoke_test.py:10-16), imports it through
dsjax.model.torch_import, and evaluates greedy (and optionally beam+LM) WER
on a prepared manifest — the de-facto accuracy fixture for parity with the
reference (SURVEY.md §4). Requires network access; in the build sandbox the
import MECHANISM is covered by tests/test_ckpt_import.py instead.

Usage:
  python tools/eval_reference.py --model an4 --test-manifest data/an4_test_manifest.json
  python tools/eval_reference.py --model librispeech --test-manifest ... \
      --lm 3-gram.pruned.3e-7.arpa --alpha 0.5 --beta 0.8
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CKPT_URLS = {
    "an4": "https://github.com/SeanNaren/deepspeech.pytorch/releases/download/"
           "V3.0/an4_pretrained_v3.ckpt",
    "librispeech": "https://github.com/SeanNaren/deepspeech.pytorch/releases/"
                   "download/V3.0/librispeech_pretrained_v3.ckpt",
    "ted": "https://github.com/SeanNaren/deepspeech.pytorch/releases/download/"
           "V3.0/ted_pretrained_v3.ckpt",
}
LM_URL = "http://www.openslr.org/resources/11/3-gram.pruned.3e-7.arpa.gz"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=sorted(CKPT_URLS), default="an4")
    p.add_argument("--test-manifest", required=True)
    p.add_argument("--lm", default="", help="ARPA LM path (enables beam decode)")
    p.add_argument("--alpha", type=float, default=0.5)
    p.add_argument("--beta", type=float, default=0.8)
    p.add_argument("--beam-width", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=20)
    args = p.parse_args()

    from dsjax.config import EvalConfig, compose
    from dsjax.datasets.common import download
    from dsjax.workflows import evaluate

    ckpt = download(CKPT_URLS[args.model], f"{args.model}_pretrained_v3.ckpt")

    overrides = [f"model.model_path={ckpt}",
                 f"test_path={args.test_manifest}",
                 f"batch_size={args.batch_size}",
                 "verbose=false"]
    print(f"== greedy decode ({args.model}) ==")
    wer_g, cer_g = evaluate(compose(EvalConfig, overrides))

    if args.lm:
        print(f"== beam + LM decode (alpha={args.alpha} beta={args.beta}) ==")
        wer_b, cer_b = evaluate(compose(EvalConfig, overrides + [
            "lm.decoder_type=beam",
            f"lm.lm_path={args.lm}",
            f"lm.alpha={args.alpha}",
            f"lm.beta={args.beta}",
            f"lm.beam_width={args.beam_width}",
        ]))
        print(f"greedy WER {wer_g:.3f} CER {cer_g:.3f} | "
              f"beam+LM WER {wer_b:.3f} CER {cer_b:.3f}")


if __name__ == "__main__":
    main()
