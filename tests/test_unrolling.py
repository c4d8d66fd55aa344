"""Curriculum look-ahead schedules match the reference trainers."""

from transformerbasednavierstokesolver_tpu.cli.unrolling import advance_curriculum


def _trajectory(variant, epochs, la0=1, cap=8):
    la, thresh = la0, epochs / 2
    out = []
    for ep in range(epochs):
        la, thresh = advance_curriculum(variant, ep, la, thresh, cap)
        out.append(la)
    return out


def test_velocity_schedule():
    traj = _trajectory("velocity", 200, cap=8)
    assert traj[39] == 1 and traj[40] == 2
    assert traj[80] == 3 and traj[120] == 4 and traj[199] == 5


def test_with_t_schedule():
    traj = _trajectory("with_t", 60, cap=4)
    assert traj[9] == 1 and traj[10] == 2
    assert traj[20] == 3 and traj[30] == 4
    # the reference's pre-increment guard (look_ahead <= max THEN += 1)
    # lets look_ahead reach cap+1 (ns_unrolling2_with_t.py:208-212)
    assert traj[40] == 5 and traj[59] == 5


def test_velocity_schedule_reaches_cap_plus_one():
    # ns_velocity_unrolling.py:210-214: at ep 320 look_ahead is 8 <= 8,
    # so the reference increments to 9 and trains epochs 320-499 there
    traj = _trajectory("velocity", 500, cap=8)
    assert traj[319] == 8 and traj[320] == 9 and traj[499] == 9


def test_vorticity_schedule_doubles_with_halving_threshold():
    traj = _trajectory("vorticity", 500, cap=10)
    # thresh 250 -> x2 at 250; thresh 125 -> x2 at 375; thresh 62.5 -> 437.5
    # never hits integer ep again until the cap logic
    assert traj[249] == 1 and traj[250] == 2
    assert traj[374] == 2 and traj[375] == 4
    assert traj[499] == 4


def test_vorticity_small_epochs():
    traj = _trajectory("vorticity", 4, cap=10)
    # thresh 2: x2 at ep 2 (->2, thresh 1), x2 at ep 3 (ep%1==0, ->4)
    assert traj == [1, 1, 2, 4]
