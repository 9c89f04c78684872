"""BASELINE config 5 integration: multi-robot shared map + cross-robot
closures + distributed BA on the virtual mesh (scripts/config5_demo.run)."""

import numpy as np


def test_config5_multi_robot_cross_closures_and_ba(tmp_path):
    from scripts.config5_demo import run

    res = run(num_revs=14, particles=16)
    assert res["robots"] == 2
    # shared-map filtering localizes both robots
    assert max(res["online_ate_m"]) < 0.25, res
    # inter-robot alignment constraints were found and verified
    assert res["closures_cross_robot"] >= 1, res
    # distributed BA reduces the joint graph error ...
    assert res["chi2_last"] < res["chi2_first"], res
    assert np.isfinite(res["chi2_last"])
    # ... and the optimized trajectories beat dead reckoning on average
    assert (np.mean(res["optimized_ate_m"])
            < np.mean(res["dead_reckoning_ate_m"]) + 0.02), res
