"""Stage-3 tail rebalance (stage3_balance='tail_deficit'): the
last-generated view — the full-schedule quality outlier, which never
appears in any 4:1 replay pool (text2nerf_main.py:550-555) — must get the
LARGEST stage-3 sampling weight, and the weighted sampler must deliver
batches in those proportions."""

import numpy as np

from text2nerf_tpu.engine import trainer


def _cfg(**kw):
    return trainer.TrainConfig(
        n_stage1=50, n_stage2=50, n_stage3=10, batch_size=16384,
        stage3_balance="tail_deficit", **kw,
    )


def test_weights_strictly_increase_with_recency():
    # the later a view's content was generated, the fewer epochs the
    # field has had to reconcile it — weights must be strictly increasing
    # in view index, with the seed view (present the whole schedule)
    # smallest.  The recency model depends only on the schedule, not the
    # pool sizes (the first-cut per-ray-exposure model keyed on pool
    # sizes and was measured WRONG: the seed view's ~24-warp pool made it
    # draw 51% of stage-3 batches, PERF.md round 4).
    lengths = [6_300_000, 262144, 262144, 262144]  # real-run shape
    w = trainer.stage3_view_weights(_cfg(), lengths, iters1=16)
    assert abs(w.sum() - 1.0) < 1e-12
    assert np.all(np.diff(w) > 0), w
    assert np.argmax(w) == 3 and np.argmin(w) == 0, w
    # gamma sharpens the skew monotonically (the A/B strength knob)
    w4 = trainer.stage3_view_weights(
        _cfg(stage3_balance_gamma=4.0), lengths, iters1=16
    )
    assert w4[3] > w[3] and w4[1] < w[1], (w, w4)
    # the production 22/22/10 shape: last view's share beats uniform by a
    # wide margin (the whole point of the rebalance)
    cfg22 = trainer.TrainConfig(
        n_stage1=22, n_stage2=22, n_stage3=10, batch_size=16384,
        stage3_balance="tail_deficit",
    )
    w22 = trainer.stage3_view_weights(cfg22, lengths, iters1=16)
    assert w22[3] > 0.4, w22


def test_uniform_exposures_give_uniform_weights():
    # a single view (stage-1-only fit) degenerates to weight 1
    w = trainer.stage3_view_weights(_cfg(), [4096], iters1=4)
    assert np.allclose(w, [1.0])


def test_gamma_zero_is_uniform_over_nonempty():
    lengths = [1000, 2000, 0, 500]
    w = trainer.stage3_view_weights(
        _cfg(stage3_balance_gamma=0.0), lengths, iters1=2
    )
    assert w[2] == 0.0            # empty pool draws nothing
    nz = w[w > 0]
    assert np.allclose(nz, nz[0])  # gamma=0 flattens the rest


def test_weighted_sampler_matches_proportions_and_pools():
    rng = np.random.default_rng(0)
    batch = 32
    pools = [
        tuple(np.full((n, c), v, np.float32)
              for c in (6, 3, 1))
        for v, n in enumerate((400, 64, 16))  # last pool < batch
    ]
    w = np.array([0.2, 0.3, 0.5])
    s = trainer._WeightedViewSampler(pools, w, batch, seed=3)
    counts = np.zeros(3)
    for _ in range(600):
        b = s.next_batch()
        v = int(b["rays"][0, 0])  # pool contents encode the view id
        assert b["rays"].shape == (batch, 6)
        assert np.all(np.asarray(b["rays"]) == v)
        assert np.all(np.asarray(b["rgb"]) == v)
        counts[v] += 1
    assert np.allclose(counts / counts.sum(), w, atol=0.06), counts
    del rng
