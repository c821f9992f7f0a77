"""Test-only encoders for the native audio decoder: mp3 (libmp3lame),
ogg/vorbis (libvorbisenc), ogg|webm/opus (libopus), via ctypes against the
system encoder libraries, plus minimal Ogg page and WebM/EBML muxers."""

from __future__ import annotations

import ctypes
import struct
from typing import List, Optional, Tuple

import numpy as np


def _try_cdll(*names) -> Optional[ctypes.CDLL]:
    for n in names:
        try:
            return ctypes.CDLL(n)
        except OSError:
            continue
    return None


# ---------------------------------------------------------------------------
# MP3 via libmp3lame
# ---------------------------------------------------------------------------

def encode_mp3(y: np.ndarray, sr: int) -> Optional[bytes]:
    lame = _try_cdll("libmp3lame.so.0", "libmp3lame.so")
    if lame is None:
        return None
    lame.lame_init.restype = ctypes.c_void_p
    for f in ("lame_set_in_samplerate", "lame_set_num_channels",
              "lame_set_out_samplerate", "lame_set_brate", "lame_init_params"):
        getattr(lame, f).argtypes = [ctypes.c_void_p] + (
            [ctypes.c_int] if f != "lame_init_params" else [])
        getattr(lame, f).restype = ctypes.c_int
    lame.lame_encode_buffer.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_short),
        ctypes.POINTER(ctypes.c_short), ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int]
    lame.lame_encode_buffer.restype = ctypes.c_int
    lame.lame_encode_flush.argtypes = [ctypes.c_void_p,
                                       ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int]
    lame.lame_encode_flush.restype = ctypes.c_int
    lame.lame_close.argtypes = [ctypes.c_void_p]

    gfp = lame.lame_init()
    lame.lame_set_in_samplerate(gfp, sr)
    lame.lame_set_num_channels(gfp, 1)
    lame.lame_set_out_samplerate(gfp, sr)
    lame.lame_set_brate(gfp, 96)
    if lame.lame_init_params(gfp) < 0:
        lame.lame_close(gfp)
        return None
    pcm = np.clip(np.round(y * 32767.0), -32768, 32767).astype(np.int16)
    n = len(pcm)
    outbuf = (ctypes.c_ubyte * (n + 32768))()
    pcm_p = pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_short))
    out = bytearray()
    wrote = lame.lame_encode_buffer(gfp, pcm_p, pcm_p, n, outbuf, len(outbuf))
    if wrote < 0:
        lame.lame_close(gfp)
        return None
    out += bytes(outbuf[:wrote])
    wrote = lame.lame_encode_flush(gfp, outbuf, len(outbuf))
    out += bytes(outbuf[:max(wrote, 0)])
    lame.lame_close(gfp)
    return bytes(out)


# ---------------------------------------------------------------------------
# Ogg page writer (CRC32, poly 0x04c11db7, no reflection)
# ---------------------------------------------------------------------------

_OGG_CRC = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) if (_r & 0x80000000) else (_r << 1)
    _OGG_CRC.append(_r & 0xFFFFFFFF)


def _ogg_crc(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _OGG_CRC[((crc >> 24) & 0xFF) ^ b]
    return crc


def _ogg_page(packets: List[bytes], serial: int, pageno: int, granule: int,
              flags: int) -> bytes:
    lacing = bytearray()
    body = bytearray()
    for pkt in packets:
        q, r = divmod(len(pkt), 255)
        lacing += b"\xff" * q + bytes([r])
        body += pkt
    header = bytearray(b"OggS\x00" + bytes([flags]))
    header += struct.pack("<q", granule)
    header += struct.pack("<I", serial)
    header += struct.pack("<I", pageno)
    header += b"\x00\x00\x00\x00"  # crc placeholder
    header += bytes([len(lacing)]) + lacing
    page = bytes(header) + bytes(body)
    crc = _ogg_crc(page)
    return page[:22] + struct.pack("<I", crc) + page[26:]


# ---------------------------------------------------------------------------
# Opus via libopus
# ---------------------------------------------------------------------------

def _opus_encode_packets(y48: np.ndarray) -> Optional[Tuple[List[bytes], int]]:
    """Encode mono 48 kHz float -> (packets of 960 samples each, n_samples)."""
    opus = _try_cdll("libopus.so.0", "libopus.so")
    if opus is None:
        return None
    opus.opus_encoder_create.restype = ctypes.c_void_p
    opus.opus_encoder_create.argtypes = [ctypes.c_int32, ctypes.c_int,
                                         ctypes.c_int,
                                         ctypes.POINTER(ctypes.c_int)]
    opus.opus_encode_float.restype = ctypes.c_int
    opus.opus_encode_float.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int32]
    opus.opus_encoder_destroy.argtypes = [ctypes.c_void_p]
    err = ctypes.c_int()
    enc = opus.opus_encoder_create(48000, 1, 2049, ctypes.byref(err))  # AUDIO
    if not enc or err.value != 0:
        return None
    frame = 960
    n = (len(y48) // frame) * frame
    y48 = y48[:n].astype(np.float32)
    outbuf = (ctypes.c_ubyte * 4000)()
    packets = []
    for i in range(0, n, frame):
        chunk = np.ascontiguousarray(y48[i:i + frame])
        m = opus.opus_encode_float(
            enc, chunk.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), frame,
            outbuf, len(outbuf))
        if m < 0:
            opus.opus_encoder_destroy(enc)
            return None
        packets.append(bytes(outbuf[:m]))
    opus.opus_encoder_destroy(enc)
    return packets, n


def _opus_head(channels: int = 1, preskip: int = 0, rate: int = 48000) -> bytes:
    return (b"OpusHead" + bytes([1, channels]) + struct.pack("<H", preskip)
            + struct.pack("<I", rate) + struct.pack("<h", 0) + bytes([0]))


def encode_ogg_opus(y48: np.ndarray) -> Optional[bytes]:
    res = _opus_encode_packets(y48)
    if res is None:
        return None
    packets, n = res
    serial = 0x1234
    out = bytearray()
    out += _ogg_page([_opus_head()], serial, 0, 0, 0x02)          # BOS
    tags = b"OpusTags" + struct.pack("<I", 4) + b"test" + struct.pack("<I", 0)
    out += _ogg_page([tags], serial, 1, 0, 0)
    granule = 0
    for i, pkt in enumerate(packets):
        granule += 960
        flags = 0x04 if i == len(packets) - 1 else 0
        out += _ogg_page([pkt], serial, 2 + i, granule, flags)
    return bytes(out)


# ---------------------------------------------------------------------------
# Vorbis via libvorbis/libvorbisenc
# ---------------------------------------------------------------------------

class _OggPacket(ctypes.Structure):
    _fields_ = [("packet", ctypes.POINTER(ctypes.c_ubyte)),
                ("bytes", ctypes.c_long), ("b_o_s", ctypes.c_long),
                ("e_o_s", ctypes.c_long), ("granulepos", ctypes.c_int64),
                ("packetno", ctypes.c_int64)]

    def tobytes(self) -> bytes:
        return bytes(bytearray(self.packet[i] for i in range(self.bytes)))


def _vorbis_encode_packets(y: np.ndarray, sr: int
                           ) -> Optional[Tuple[List[bytes], List[Tuple[bytes, int]]]]:
    """-> (3 header packets, [(audio packet, granulepos), ...])."""
    vorbis = _try_cdll("libvorbis.so.0", "libvorbis.so")
    venc = _try_cdll("libvorbisenc.so.2", "libvorbisenc.so")
    if vorbis is None or venc is None:
        return None
    venc.vorbis_encode_init_vbr.restype = ctypes.c_int
    venc.vorbis_encode_init_vbr.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                            ctypes.c_long, ctypes.c_float]
    vorbis.vorbis_analysis_buffer.restype = ctypes.POINTER(
        ctypes.POINTER(ctypes.c_float))
    vorbis.vorbis_analysis_buffer.argtypes = [ctypes.c_void_p, ctypes.c_int]

    vi = ctypes.create_string_buffer(1024)
    vc = ctypes.create_string_buffer(1024)
    vd = ctypes.create_string_buffer(8192)
    vb = ctypes.create_string_buffer(8192)
    vorbis.vorbis_info_init(vi)
    if venc.vorbis_encode_init_vbr(vi, 1, sr, ctypes.c_float(0.4)) != 0:
        return None
    vorbis.vorbis_comment_init(vc)
    vorbis.vorbis_analysis_init(vd, vi)
    vorbis.vorbis_block_init(vd, vb)

    h1, h2, h3 = _OggPacket(), _OggPacket(), _OggPacket()
    vorbis.vorbis_analysis_headerout(vd, vc, ctypes.byref(h1),
                                     ctypes.byref(h2), ctypes.byref(h3))
    headers = [h1.tobytes(), h2.tobytes(), h3.tobytes()]

    audio: List[Tuple[bytes, int]] = []

    def drain():
        while vorbis.vorbis_analysis_blockout(vd, vb) == 1:
            vorbis.vorbis_analysis(vb, None)
            vorbis.vorbis_bitrate_addblock(vb)
            op = _OggPacket()
            while vorbis.vorbis_bitrate_flushpacket(vd, ctypes.byref(op)) == 1:
                audio.append((op.tobytes(), int(op.granulepos)))

    y = y.astype(np.float32)
    chunk = 4096
    for i in range(0, len(y), chunk):
        seg = y[i:i + chunk]
        buf = vorbis.vorbis_analysis_buffer(vd, len(seg))
        ctypes.memmove(buf[0], seg.ctypes.data, 4 * len(seg))
        vorbis.vorbis_analysis_wrote(vd, len(seg))
        drain()
    vorbis.vorbis_analysis_wrote(vd, 0)
    drain()
    return headers, audio


def encode_ogg_vorbis(y: np.ndarray, sr: int) -> Optional[bytes]:
    res = _vorbis_encode_packets(y, sr)
    if res is None:
        return None
    headers, audio = res
    serial = 0x5678
    out = bytearray()
    out += _ogg_page([headers[0]], serial, 0, 0, 0x02)      # BOS: ident alone
    out += _ogg_page(headers[1:], serial, 1, 0, 0)          # comment + setup
    for i, (pkt, gp) in enumerate(audio):
        flags = 0x04 if i == len(audio) - 1 else 0
        out += _ogg_page([pkt], serial, 2 + i, gp, flags)
    return bytes(out)


# ---------------------------------------------------------------------------
# Minimal WebM/EBML muxer
# ---------------------------------------------------------------------------

def _vint_size(v: int) -> bytes:
    """EBML data-size vint."""
    for n in range(1, 9):
        if v < (1 << (7 * n)) - 1:
            out = bytearray(n)
            out[0] = (1 << (8 - n)) | (v >> (8 * (n - 1))) & 0xFF
            for i in range(1, n):
                out[i] = (v >> (8 * (n - 1 - i))) & 0xFF
            return bytes(out)
    raise ValueError(v)


def _elem(eid: int, payload: bytes) -> bytes:
    idb = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
    return idb + _vint_size(len(payload)) + payload


def _uint(v: int) -> bytes:
    n = max(1, (v.bit_length() + 7) // 8)
    return v.to_bytes(n, "big")


def mux_webm(codec_id: str, codec_private: bytes, frames: List[bytes],
             rate: float, channels: int = 1) -> bytes:
    ebml = _elem(0x1A45DFA3, b"".join([
        _elem(0x4286, _uint(1)),            # EBMLVersion
        _elem(0x42F7, _uint(1)),            # EBMLReadVersion
        _elem(0x42F2, _uint(4)),            # EBMLMaxIDLength
        _elem(0x42F3, _uint(8)),            # EBMLMaxSizeLength
        _elem(0x4282, b"webm"),             # DocType
        _elem(0x4287, _uint(2)),            # DocTypeVersion
        _elem(0x4285, _uint(2)),            # DocTypeReadVersion
    ]))
    audio = _elem(0xE1, _elem(0xB5, struct.pack(">f", rate))
                  + _elem(0x9F, _uint(channels)))
    entry_parts = [
        _elem(0xD7, _uint(1)),              # TrackNumber
        _elem(0x73C5, _uint(1)),            # TrackUID
        _elem(0x83, _uint(2)),              # TrackType: audio
        _elem(0x86, codec_id.encode()),     # CodecID
        audio,
    ]
    if codec_private:
        entry_parts.append(_elem(0x63A2, codec_private))
    tracks = _elem(0x1654AE6B, _elem(0xAE, b"".join(entry_parts)))
    info = _elem(0x1549A966, _elem(0x2AD7B1, _uint(1000000))  # TimestampScale
                 + _elem(0x4D80, b"dsjax") + _elem(0x5741, b"dsjax"))
    blocks = bytearray()
    for i, f in enumerate(frames):
        # SimpleBlock: track vint(0x81=1), int16 timecode, flags 0, frame
        payload = b"\x81" + struct.pack(">h", i * 20) + b"\x00" + f
        blocks += _elem(0xA3, payload)
    cluster = _elem(0x1F43B675, _elem(0xE7, _uint(0)) + bytes(blocks))
    segment = _elem(0x18538067, info + tracks + cluster)
    return ebml + segment


def xiph_private(headers: List[bytes]) -> bytes:
    """Matroska CodecPrivate for vorbis: xiph-laced 3 headers."""
    out = bytearray([len(headers) - 1])
    for h in headers[:-1]:
        n = len(h)
        while n >= 255:
            out.append(255)
            n -= 255
        out.append(n)
    for h in headers:
        out += h
    return bytes(out)


def encode_webm_opus(y48: np.ndarray) -> Optional[bytes]:
    res = _opus_encode_packets(y48)
    if res is None:
        return None
    packets, _ = res
    return mux_webm("A_OPUS", _opus_head(), packets, 48000.0)


def encode_webm_vorbis(y: np.ndarray, sr: int) -> Optional[bytes]:
    res = _vorbis_encode_packets(y, sr)
    if res is None:
        return None
    headers, audio = res
    return mux_webm("A_VORBIS", xiph_private(headers),
                    [pkt for pkt, _ in audio], float(sr))
