"""Smoke tests for the runnable examples/ scripts.

Each example exposes a parameterizable entry so the suite can run it at toy
scale (the documented defaults are exercised manually / in benchmarks).
"""

import os
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")
sys.path.insert(0, os.path.abspath(EXAMPLES))


def test_train_keyword_spotter_learns():
    import train_keyword_spotter as m

    # toy scale: enough steps that loss clearly moves and the checkpoint
    # round-trip + eval path all execute
    acc = m.main(steps=12, batch=16)
    assert 0.0 <= acc <= 1.0
    assert acc > 1.5 / m.N_CLASSES  # clearly better than chance


def test_multichip_parallelism_tour():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    import multichip_parallelism as m

    m.run_tour(steps=2)


def test_streaming_realtime_exactness():
    import streaming_realtime as m

    m.main(streams=4, seconds=0.5)


def test_music_analysis_recovers_structure():
    import music_analysis as m

    m.main(bpm=120.0, sr=22050)
