import random

from tpuhevc.entropy import bitio


def test_bitwriter_reader_roundtrip():
    rng = random.Random(1)
    w = bitio.BitWriter()
    items = []
    for _ in range(2000):
        kind = rng.randrange(3)
        if kind == 0:
            n = rng.randrange(1, 25)
            v = rng.randrange(1 << n)
            items.append(("u", v, n))
            w.write(v, n)
        elif kind == 1:
            v = rng.randrange(100000)
            items.append(("ue", v, 0))
            w.write_ue(v)
        else:
            v = rng.randrange(-5000, 5000)
            items.append(("se", v, 0))
            w.write_se(v)
    w.rbsp_trailing_bits()
    r = bitio.BitReader(w.getvalue())
    for kind, v, n in items:
        if kind == "u":
            assert r.read(n) == v
        elif kind == "ue":
            assert r.read_ue() == v
        else:
            assert r.read_se() == v


def test_ue_small_values():
    w = bitio.BitWriter()
    for v in range(20):
        w.write_ue(v)
    w.rbsp_trailing_bits()
    r = bitio.BitReader(w.getvalue())
    assert [r.read_ue() for _ in range(20)] == list(range(20))


def test_emulation_prevention_roundtrip():
    rng = random.Random(2)
    for _ in range(200):
        raw = bytes(
            rng.choice([0, 0, 0, 1, 2, 3, 255]) for _ in range(rng.randrange(1, 64))
        )
        ebsp = bitio.rbsp_to_ebsp(raw)
        # no start-code emulation inside the escaped payload
        assert b"\x00\x00\x00" not in ebsp
        assert b"\x00\x00\x01" not in ebsp
        assert b"\x00\x00\x02" not in ebsp
        assert not ebsp.endswith(b"\x00")
        assert bitio.ebsp_to_rbsp(ebsp)[: len(raw)] == raw


def test_annexb_roundtrip():
    nals = [
        bitio.make_nal(bitio.NAL_VPS, b"\x01\x02\x80"),
        bitio.make_nal(bitio.NAL_SPS, b"\x00\x00\x03\x04\x80"),
        bitio.make_nal(bitio.NAL_IDR_W_RADL, bytes(range(40)) + b"\x80"),
    ]
    stream = bitio.write_annexb(nals)
    back = bitio.read_annexb(stream)
    assert back == nals


def test_more_rbsp_data():
    w = bitio.BitWriter()
    w.write_ue(5)
    w.rbsp_trailing_bits()
    r = bitio.BitReader(w.getvalue())
    assert r.more_rbsp_data()
    r.read_ue()
    assert not r.more_rbsp_data()
