"""VoxForge dataset prep (reference parity: data/voxforge.py:15-105).

Scrapes the VoxForge 16kHz corpus index, downloads each recording tarball,
pairs wav/flac audio with prompt transcripts, and builds a manifest.
"""

from __future__ import annotations

import argparse
import io
import os
import re
import tarfile
import tempfile
import urllib.request

from dsjax.data.manifest import create_manifest
from dsjax.datasets.common import add_data_opts, convert_to_wav

VOXFORGE_URL_16kHz = ("http://www.repository.voxforge1.org/downloads/SpeechCorpus/"
                      "Trunk/Audio/Main/16kHz_16bit/")


def _get_recordings_dir(sample_dir: str, recording_name: str):
    for kind in ("wav", "flac"):
        d = os.path.join(sample_dir, recording_name, kind)
        if os.path.exists(d):
            return kind, d
    raise FileNotFoundError(f"wav or flac dir not found for {recording_name}")


def prepare_sample(recording_name: str, url: str, target_folder: str,
                   sample_rate: int = 16000) -> None:
    wav_dir = os.path.join(target_folder, "wav")
    txt_dir = os.path.join(target_folder, "txt")
    os.makedirs(wav_dir, exist_ok=True)
    os.makedirs(txt_dir, exist_ok=True)
    done = {"_".join(w.split("_")[:-1]) for w in os.listdir(wav_dir)}
    if recording_name in done:
        return
    with urllib.request.urlopen(url) as resp:
        content = resp.read()
    with tempfile.TemporaryDirectory() as dirpath:
        with tarfile.open(fileobj=io.BytesIO(content)) as tar:
            tar.extractall(dirpath)
        kind, recordings_dir = _get_recordings_dir(dirpath, recording_name)
        prompts_file = os.path.join(dirpath, recording_name, "etc", "PROMPTS")
        if not os.path.exists(prompts_file):
            return
        with open(prompts_file) as f:
            for line in f:
                parts = line.strip().split()
                if len(parts) < 2:
                    continue
                utt_id = parts[0].split("/")[-1]
                transcript = " ".join(parts[1:]).upper()
                src = os.path.join(recordings_dir, f"{utt_id}.{kind}")
                if not os.path.exists(src):
                    continue
                base = f"{recording_name}_{utt_id}"
                try:
                    convert_to_wav(src, os.path.join(wav_dir, base + ".wav"),
                                   sample_rate)
                except Exception as e:
                    print(f"skipping {src}: {e}")
                    continue
                with open(os.path.join(txt_dir, base + ".txt"), "w") as tf:
                    tf.write(transcript)


def main() -> None:
    parser = argparse.ArgumentParser(description="Processes and downloads VoxForge dataset.")
    parser = add_data_opts(parser)
    parser.add_argument("--target-dir", default="voxforge_dataset/", type=str)
    args = parser.parse_args()
    target_dir = args.target_dir
    os.makedirs(target_dir, exist_ok=True)
    with urllib.request.urlopen(VOXFORGE_URL_16kHz) as resp:
        index = resp.read().decode("utf8", errors="replace")
    names = sorted(set(re.findall(r'href="([\w\-.]+\.tgz)"', index)))
    for archive in names:
        prepare_sample(archive.replace(".tgz", ""),
                       VOXFORGE_URL_16kHz + archive, target_dir,
                       args.sample_rate)
    print("Creating manifests...")
    create_manifest(target_dir, "voxforge_train_manifest.json", args.manifest_dir,
                    min_duration=args.min_duration, max_duration=args.max_duration)


if __name__ == "__main__":
    main()
