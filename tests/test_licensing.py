"""The shared licensing band (eval/licensing.py) — the criterion every
relaxation ruling gates on (selftest/relaxation_sweep/fg_probe/regime_curve
all import it; round-5 review finding #6 deduplicated the four copies)."""

import numpy as np

from kd_pointcloud_tpu.eval.licensing import (BAND, LOWER_BETTER,
                                              METRIC_NAMES, in_band)


class TestDirectionalBand:
    def test_zero_delta_in_band(self):
        assert in_band(np.zeros(6))

    def test_improvements_never_fail(self):
        """Directional: EPE/Outliers improving (negative) and ACC improving
        (positive) by ANY amount stays in band."""
        d = np.array([-1.0, 1.0, 1.0, -1.0, -1.0, 1.0])
        assert in_band(d)

    def test_each_metric_degradation_gates(self):
        """Degrading any single metric past its tolerance fails the band."""
        for i, (b, lb) in enumerate(zip(BAND, LOWER_BETTER)):
            d = np.zeros(6)
            d[i] = (b * 1.01) if lb else -(b * 1.01)
            assert not in_band(d), METRIC_NAMES[i]
            d[i] = (b * 0.99) if lb else -(b * 0.99)
            assert in_band(d), METRIC_NAMES[i]

    def test_round5_rulings_reproduce(self):
        """Pin the verdicts of the round-5 regime-curve rulings at the most
        accurate checkpoint (evidence/round5/regime_curve{,_k24}.json):
        production/cw0 in band, K=24@l0 out (ACC3DS -5.1e-3)."""
        production = [2e-06, -0.000378, -0.000251, -0.00083,
                      -0.001887, 0.000144]
        k24l0 = [0.000746, -0.005132, -0.002751, 0.001223,
                 0.034701, -0.005347]
        assert in_band(np.asarray(production))
        assert not in_band(np.asarray(k24l0))
