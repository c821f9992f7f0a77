"""TED-LIUM v2 dataset prep (reference parity: data/ted.py:20-146).

Segments each talk's NIST SPHERE recording by its STM utterance timings into
per-utterance 16k mono wav + txt pairs, then builds manifests. SPHERE
parsing and trimming are native (no sox).
"""

from __future__ import annotations

import argparse
import io
import os
import unicodedata
from typing import Dict, List

import numpy as np

from dsjax.audio.io import resample, save_wav
from dsjax.data.manifest import create_manifest
from dsjax.datasets.common import add_data_opts, download, extract, read_sphere

TED_LIUM_V2_DL_URL = "http://www.openslr.org/resources/19/TEDLIUM_release2.tar.gz"


def get_utterances_from_stm(stm_file: str) -> List[Dict]:
    res = []
    with io.open(stm_file, "r", encoding="utf-8") as f:
        for stm_line in f:
            tokens = stm_line.split()
            start_time, end_time = float(tokens[3]), float(tokens[4])
            filename = tokens[0]
            transcript = unicodedata.normalize(
                "NFKD", " ".join(t for t in tokens[6:]).strip()
            ).encode("utf-8", "ignore").decode("utf-8", "ignore")
            if transcript != "ignore_time_segment_in_scoring":
                res.append({"start_time": start_time, "end_time": end_time,
                            "filename": filename, "transcript": transcript})
    return res


def _preprocess_transcript(phrase: str) -> str:
    return phrase.strip().upper()


def prepare_dir(ted_dir: str, sample_rate: int, min_len_sec: float = 1.0) -> None:
    converted = os.path.join(ted_dir, "converted")
    wav_dir = os.path.join(converted, "wav")
    txt_dir = os.path.join(converted, "txt")
    os.makedirs(wav_dir, exist_ok=True)
    os.makedirs(txt_dir, exist_ok=True)
    for sph_file in sorted(os.listdir(os.path.join(ted_dir, "sph"))):
        speaker = sph_file.split(".sph")[0]
        sph_path = os.path.join(ted_dir, "sph", sph_file)
        stm_path = os.path.join(ted_dir, "stm", f"{speaker}.stm")
        if not os.path.exists(stm_path):
            continue
        utterances = [u for u in get_utterances_from_stm(stm_path)
                      if u["end_time"] - u["start_time"] > min_len_sec]
        audio, sr = read_sphere(sph_path)
        if sr != sample_rate:
            audio = resample(audio, sr, sample_rate)
            sr = sample_rate
        for uid, utt in enumerate(utterances):
            i0 = int(utt["start_time"] * sr)
            i1 = int(utt["end_time"] * sr)
            seg = audio[i0:i1]
            save_wav(os.path.join(wav_dir, f"{utt['filename']}_{uid}.wav"), seg, sr)
            with open(os.path.join(txt_dir, f"{utt['filename']}_{uid}.txt"), "w",
                      encoding="utf-8") as f:
                f.write(_preprocess_transcript(utt["transcript"]))


def main() -> None:
    parser = argparse.ArgumentParser(description="Processes and downloads TED-LIUMv2 dataset.")
    parser = add_data_opts(parser)
    parser.add_argument("--target-dir", default="TEDLIUM_dataset/", type=str)
    parser.add_argument("--tar-path", type=str, default=None,
                        help="Path to the TEDLIUM_release tar if downloaded (Optional).")
    args = parser.parse_args()

    os.makedirs(args.target_dir, exist_ok=True)
    unpacked = os.path.join(args.target_dir, "TEDLIUM_release2")
    if args.tar_path and os.path.exists(args.tar_path):
        target_file = args.tar_path
    else:
        target_file = os.path.join(args.target_dir, "TEDLIUM_release2.tar.gz")
        download(TED_LIUM_V2_DL_URL, target_file)
    if not os.path.exists(unpacked):
        print("Unpacking corpus...")
        extract(target_file, args.target_dir)

    train_dir = os.path.join(unpacked, "train")
    val_dir = os.path.join(unpacked, "dev")
    test_dir = os.path.join(unpacked, "test")
    for d in (train_dir, val_dir, test_dir):
        prepare_dir(d, args.sample_rate)
    print("Creating manifests...")
    create_manifest(train_dir, "ted_train_manifest.json", args.manifest_dir,
                    min_duration=args.min_duration, max_duration=args.max_duration)
    create_manifest(val_dir, "ted_val_manifest.json", args.manifest_dir)
    create_manifest(test_dir, "ted_test_manifest.json", args.manifest_dir)


if __name__ == "__main__":
    main()
