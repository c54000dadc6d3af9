"""TensorBoard event-file writer: independent round-trip parse.

Decodes the TFRecord framing and the Event/Summary protobuf wire format
with a standalone parser (no tensorboard import), verifying CRCs, tags,
scalar values, steps, and the embedded PNG image."""

import struct

import numpy as np

from pix2pix3d_tpu.train.tb import TBWriter, masked_crc32c


def _read_records(path):
    out = []
    with open(path, "rb") as f:
        data = f.read()
    i = 0
    while i < len(data):
        (length,) = struct.unpack("<Q", data[i:i + 8])
        (len_crc,) = struct.unpack("<I", data[i + 8:i + 12])
        assert len_crc == masked_crc32c(data[i:i + 8])
        payload = data[i + 12:i + 12 + length]
        (crc,) = struct.unpack("<I", data[i + 12 + length:i + 16 + length])
        assert crc == masked_crc32c(payload)
        out.append(payload)
        i += 16 + length
    return out


def _varint(buf, i):
    n = shift = 0
    while True:
        b = buf[i]
        n |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return n, i
        shift += 7


def _parse_fields(buf):
    fields = {}
    i = 0
    while i < len(buf):
        key, i = _varint(buf, i)
        num, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v = struct.unpack("<d", buf[i:i + 8])[0]
            i += 8
        elif wt == 5:
            v = struct.unpack("<f", buf[i:i + 4])[0]
            i += 4
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        else:
            raise ValueError(wt)
        fields.setdefault(num, []).append(v)
    return fields


def test_scalars_and_image_roundtrip(tmp_path):
    w = TBWriter(str(tmp_path))
    w.add_scalars({"Loss/G/loss": 1.5, "Loss/D/loss": -0.25}, step=7)
    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    w.add_image("fakes", img, step=7)
    w.close()

    records = _read_records(w.path)
    assert len(records) == 3  # file_version + scalars + image

    header = _parse_fields(records[0])
    assert header[3][0] == b"brain.Event:2"

    ev = _parse_fields(records[1])
    assert ev[2][0] == 7  # step
    summary = _parse_fields(ev[5][0])
    got = {}
    for val in summary[1]:
        vf = _parse_fields(val)
        got[vf[1][0].decode()] = vf[2][0]
    assert abs(got["Loss/G/loss"] - 1.5) < 1e-6
    assert abs(got["Loss/D/loss"] + 0.25) < 1e-6

    ev_img = _parse_fields(records[2])
    val = _parse_fields(_parse_fields(ev_img[5][0])[1][0])
    assert val[1][0] == b"fakes"
    image_msg = _parse_fields(val[4][0])
    assert image_msg[1][0] == 4 and image_msg[2][0] == 6  # h, w
    import io
    import PIL.Image
    decoded = np.asarray(PIL.Image.open(io.BytesIO(image_msg[4][0])))
    np.testing.assert_array_equal(decoded, img)


def test_nan_scalars_skipped(tmp_path):
    w = TBWriter(str(tmp_path))
    w.add_scalars({"a": float("nan"), "b": 2.0}, step=1)
    w.close()
    records = _read_records(w.path)
    summary = _parse_fields(_parse_fields(records[1])[5][0])
    tags = [_parse_fields(v)[1][0].decode() for v in summary[1]]
    assert tags == ["b"]
