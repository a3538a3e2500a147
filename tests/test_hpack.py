"""HPACK codec pinned against RFC 7541's own worked examples."""

import pytest

from vector_spark.functions.hpack_codec import (
    HpackDecoder,
    HpackEncoder,
    decode_integer,
    encode_integer,
    huffman_decode,
    huffman_encode,
)


def test_integer_rfc_examples():
    # C.1.1: 10 with a 5-bit prefix -> 0b01010
    assert encode_integer(10, 5) == bytes([0b01010])
    # C.1.2: 1337 with a 5-bit prefix -> 1f 9a 0a
    assert encode_integer(1337, 5) == bytes([0x1F, 0x9A, 0x0A])
    # C.1.3: 42 on an 8-bit prefix -> one octet
    assert encode_integer(42, 8) == bytes([42])
    for v, p in ((10, 5), (1337, 5), (42, 8), (0, 1), (127, 7)):
        enc = encode_integer(v, p)
        dec, pos = decode_integer(enc, 0, p)
        assert (dec, pos) == (v, len(enc))


def test_huffman_rfc_vectors():
    # C.4.1: "www.example.com" -> f1e3 c2e5 f23a 6ba0 ab90 f4ff
    assert huffman_encode(b"www.example.com") == bytes.fromhex(
        "f1e3c2e5f23a6ba0ab90f4ff"
    )
    # C.6.1: "Mon, 21 Oct 2013 20:13:21 GMT"
    assert huffman_encode(b"Mon, 21 Oct 2013 20:13:21 GMT") == (
        bytes.fromhex("d07abe941054d444a8200595040b8166e082a62d1bff")
    )
    # C.6.1: "https://www.example.com"
    assert huffman_encode(b"https://www.example.com") == bytes.fromhex(
        "9d29ad171863c78f0b97c8e9ae82ae43d3"
    )
    for s in (b"www.example.com", b"no-cache", b"", b"custom-value",
              bytes(range(256))):
        assert huffman_decode(huffman_encode(s)) == s


def test_huffman_bad_padding_rejected():
    # 'a' = 00011 + 3 pad bits; zeroed padding is not an EOS prefix and
    # (unlike 5 zero bits, which would decode as the digit '0') three
    # zero bits cannot complete any symbol
    assert huffman_encode(b"a") == bytes([0b00011111])
    with pytest.raises(ValueError, match="padding"):
        huffman_decode(bytes([0b00011000]))


def test_rfc_c3_request_sequence_plain():
    """C.3: three requests on one connection, no Huffman — dynamic
    table evolves across blocks."""
    d = HpackDecoder()
    h1 = d.decode(bytes.fromhex(
        "828684410f7777772e6578616d706c652e636f6d"
    ))
    assert h1 == [(":method", "GET"), (":scheme", "http"),
                  (":path", "/"), (":authority", "www.example.com")]
    assert d.size == 57
    h2 = d.decode(bytes.fromhex("828684be58086e6f2d6361636865"))
    assert h2 == [(":method", "GET"), (":scheme", "http"),
                  (":path", "/"), (":authority", "www.example.com"),
                  ("cache-control", "no-cache")]
    assert d.size == 110
    h3 = d.decode(bytes.fromhex(
        "828785bf400a637573746f6d2d6b65790c637573746f6d2d76616c7565"
    ))
    assert h3 == [(":method", "GET"), (":scheme", "https"),
                  (":path", "/index.html"),
                  (":authority", "www.example.com"),
                  ("custom-key", "custom-value")]
    assert d.size == 164


def test_rfc_c4_request_sequence_huffman():
    """C.4: the same requests with Huffman-coded literals."""
    d = HpackDecoder()
    h1 = d.decode(bytes.fromhex("828684418cf1e3c2e5f23a6ba0ab90f4ff"))
    assert h1[-1] == (":authority", "www.example.com")
    h2 = d.decode(bytes.fromhex("828684be5886a8eb10649cbf"))
    assert h2[-1] == ("cache-control", "no-cache")
    h3 = d.decode(bytes.fromhex(
        "828785bf408825a849e95ba97d7f8925a849e95bb8e8b4bf"
    ))
    assert h3[-1] == ("custom-key", "custom-value")
    assert d.size == 164


def test_encoder_decoder_roundtrip():
    enc = HpackEncoder()
    headers = [
        (":status", "200"),                      # exact static hit
        ("content-type", "application/grpc"),    # static name only
        ("grpc-status", "0"),                    # raw literal
        ("x-custom", "v" * 200),                 # long string
    ]
    block = enc.encode(headers)
    assert block[0] == 0x88  # indexed :status 200
    assert HpackDecoder().decode(block) == headers


def test_decoder_table_size_update_and_eviction():
    d = HpackDecoder(max_table_size=64)
    # insert two entries of size 32+len each; table max 64 forces evict
    enc = (b"\x40" + bytes([4]) + b"aaaa" + bytes([4]) + b"1111"
           + b"\x40" + bytes([4]) + b"bbbb" + bytes([4]) + b"2222")
    d.decode(enc)
    assert d.dynamic == [("bbbb", "2222")]  # first entry evicted
    # size update to 0 clears the table (leading 001xxxxx)
    d.decode(b"\x20")
    assert d.dynamic == [] and d.size == 0
