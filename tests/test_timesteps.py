"""Parity tests for variable-timestep spacing (reference utils.rs:120-159)."""

from magics_tpu.core.timesteps import get_variable_timesteps


def test_reference_cases():
    assert get_variable_timesteps(4, 3) == [0, 1, 2, 3, 4]
    assert get_variable_timesteps(30, 3) == [0, 1, 2, 3, 5, 7, 9, 12, 15, 18, 22, 26, 30]
    assert get_variable_timesteps(60, 3) == [
        0, 1, 2, 3, 5, 7, 9, 12, 15, 18, 22, 26, 30, 35, 40, 45, 51, 57, 60,
    ]
    assert get_variable_timesteps(10, 3) == [0, 1, 2, 3, 5, 7, 9, 10]
    assert get_variable_timesteps(20, 5) == [0, 1, 2, 3, 4, 5, 7, 9, 11, 13, 15, 18, 20]


def test_doc_example():
    assert get_variable_timesteps(20, 3) == [0, 1, 2, 3, 5, 7, 9, 12, 15, 18, 20]
