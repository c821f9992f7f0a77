"""Dataset-prep parsers/segmenters driven on synthetic corpora (the network
downloads are exercised operationally; these cover the parsing/segmentation
logic end to end)."""

import os

import numpy as np

from dsjax.datasets.ted import StmSegment, parse_stm, prepare_dir
from dsjax.datasets.voxforge import _read_prompts


def _write_sphere(path, y, sr=16000):
    pcm = np.clip(np.round(y * 32768.0), -32768, 32767).astype("<i2")
    header = (f"NIST_1A\n    1024\nsample_rate -i {sr}\n"
              f"channel_count -i 1\nsample_n_bytes -i 2\n"
              f"sample_byte_format -s2 01\nsample_coding -s3 pcm\nend_head\n")
    blob = header.encode().ljust(1024, b" ") + pcm.tobytes()
    with open(path, "wb") as f:
        f.write(blob)


def test_parse_stm(tmp_path):
    stm = tmp_path / "talk.stm"
    stm.write_text(
        "TalkA 1 spk 0.50 2.50 <o,f0,male> hello there\n"
        "TalkA 1 spk 2.50 3.00 <o,f0,male> ignore_time_segment_in_scoring\n"
        "TalkA 1 spk 3.00 9.00 <o,f0,male> café isn’t bad\n"
        "malformed line\n",
        encoding="utf-8")
    segs = parse_stm(str(stm))
    assert [s.recording for s in segs] == ["TalkA", "TalkA"]
    assert segs[0].text == "hello there"
    assert segs[0].start == 0.5 and segs[0].end == 2.5
    assert abs(segs[0].duration - 2.0) < 1e-9
    # NFKD ascii fold: accent stripped, typographic apostrophe dropped
    assert segs[1].text == "cafe isnt bad"


def test_ted_prepare_dir_segments(tmp_path):
    sr = 16000
    ted = tmp_path / "train"
    (ted / "sph").mkdir(parents=True)
    (ted / "stm").mkdir()
    t = np.arange(10 * sr) / sr
    y = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    _write_sphere(str(ted / "sph" / "TalkA.sph"), y, sr)
    (ted / "stm" / "TalkA.stm").write_text(
        "TalkA 1 spk 1.00 3.00 <o> first segment\n"
        "TalkA 1 spk 3.00 3.50 <o> too short\n"
        "TalkA 1 spk 4.00 9.00 <o> second segment\n")
    prepare_dir(str(ted), sr, min_len_sec=1.0)
    wavs = sorted(os.listdir(ted / "converted" / "wav"))
    txts = sorted(os.listdir(ted / "converted" / "txt"))
    assert wavs == ["TalkA_0.wav", "TalkA_1.wav"]
    assert txts == ["TalkA_0.txt", "TalkA_1.txt"]
    assert (ted / "converted" / "txt" / "TalkA_0.txt").read_text() == "FIRST SEGMENT"
    from dsjax.audio.io import read_wav

    x, rate = read_wav(str(ted / "converted" / "wav" / "TalkA_1.wav"))
    assert rate == sr
    assert abs(x.shape[1] - 5 * sr) <= 1  # 4.0s..9.0s segment


def test_voxforge_prompts(tmp_path):
    p = tmp_path / "PROMPTS"
    p.write_text("/home/x/mfc/a0001 hello world\n"
                 "/home/x/mfc/a0002 second line here\n"
                 "badline\n")
    prompts = _read_prompts(str(p))
    assert prompts == {"a0001": "HELLO WORLD", "a0002": "SECOND LINE HERE"}
