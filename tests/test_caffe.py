"""Caffemodel wire-format reader: round-trip against a hand-encoded
NetParameter (both the new layer=100 and old layers=2 formats)."""

import struct

import numpy as np

from tpuir.weights.caffe import read_caffemodel, caffemodel_to_state_dict


def _varint(n):
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _tag(field, wt):
    return _varint((field << 3) | wt)


def _len_field(field, payload):
    return _tag(field, 2) + _varint(len(payload)) + payload


def _blob_new(arr):
    shape_payload = b""
    dims = b"".join(_varint(d) for d in arr.shape)
    shape_payload = _len_field(1, dims)  # packed dims
    data = arr.astype("<f4").tobytes()
    return _len_field(7, shape_payload) + _len_field(5, data)


def _blob_old(arr4):
    n, c, h, w = arr4
    payload = (
        _tag(1, 0) + _varint(n) + _tag(2, 0) + _varint(c)
        + _tag(3, 0) + _varint(h) + _tag(4, 0) + _varint(w)
    )
    data = np.arange(n * c * h * w, dtype="<f4")
    return payload + _len_field(5, data.tobytes()), data.reshape(n, c, h, w)


def test_new_format_roundtrip(tmp_path):
    w = np.random.RandomState(0).randn(4, 3, 3, 3).astype(np.float32)
    b = np.random.RandomState(1).randn(4).astype(np.float32)
    layer = (
        _len_field(1, b"conv1")
        + _len_field(2, b"Convolution")
        + _len_field(7, _blob_new(w))
        + _len_field(7, _blob_new(b))
    )
    net = _len_field(1, b"rednet") + _len_field(100, layer)
    p = tmp_path / "new.caffemodel"
    p.write_bytes(net)

    layers = read_caffemodel(str(p))
    np.testing.assert_array_equal(layers["conv1"][0], w)
    np.testing.assert_array_equal(layers["conv1"][1], b)
    sd = caffemodel_to_state_dict(str(p))
    np.testing.assert_array_equal(sd["conv1.weight"], w)
    np.testing.assert_array_equal(sd["conv1.bias"], b)


def test_old_format_roundtrip(tmp_path):
    blob_payload, w = _blob_old((2, 3, 3, 3))
    bias_payload, bias = _blob_old((1, 1, 1, 2))
    layer = (
        _len_field(4, b"deconv1")
        + _tag(5, 0) + _varint(39)  # V1 type enum (DECONVOLUTION)
        + _len_field(6, blob_payload)
        + _len_field(6, bias_payload)
    )
    net = _len_field(2, layer)
    p = tmp_path / "old.caffemodel"
    p.write_bytes(net)

    sd = caffemodel_to_state_dict(str(p))
    np.testing.assert_array_equal(sd["deconv1.weight"], w)
    # legacy 1x1x1xC bias blobs collapse to vectors
    np.testing.assert_array_equal(sd["deconv1.bias"], bias.reshape(-1))


def test_skips_unknown_fields(tmp_path):
    w = np.ones((1, 1, 1, 1), np.float32)
    layer = _len_field(1, b"c") + _len_field(7, _blob_new(w))
    net = (
        _tag(3, 0) + _varint(7)  # unknown varint field
        + _len_field(50, b"junkjunk")  # unknown length field
        + _len_field(100, layer)
    )
    p = tmp_path / "junk.caffemodel"
    p.write_bytes(net)
    sd = caffemodel_to_state_dict(str(p))
    np.testing.assert_array_equal(sd["c.weight"], w)
