"""Mulberry32 parity: the seeded stream must match the reference's
utils.js:333-342 generator bit-for-bit (expected values computed with an
independent plain-integer implementation of the JS semantics)."""

from multithreadedgameengine_tpu import Mulberry32

EXPECTED_123456 = [
    0.38233304349705577, 0.7972629074938595, 0.9965302373748273,
    0.16001168475486338, 0.20857197884470224, 0.23283709771931171,
    0.4750134914647788, 0.6079998253844678,
]
EXPECTED_42 = [
    0.6011037519201636, 0.44829055899754167,
    0.8524657934904099, 0.6697340414393693,
]


def test_seed_123456():
    # the predators demo's seed (demos/predators/index.html:329)
    r = Mulberry32(123456)
    for want in EXPECTED_123456:
        assert r() == want


def test_seed_42():
    r = Mulberry32(42)
    for want in EXPECTED_42:
        assert r() == want


def test_streams_independent():
    a, b = Mulberry32(1), Mulberry32(1)
    assert [a() for _ in range(5)] == [b() for _ in range(5)]


def test_uniform_and_range():
    r = Mulberry32(9)
    v = r.uniform(10.0, 20.0)
    assert 10.0 <= v <= 20.0
    assert r.random_range(5.5) == 5.5
    lo_hi = r.random_range({"min": 2.0, "max": 3.0})
    assert 2.0 <= lo_hi <= 3.0
