"""Metric registry and runner (ref `metrics/metric_main.py:29-68`)."""

from __future__ import annotations

import time

from . import metric_utils
from .frechet_inception_distance import compute_fid
from .kernel_inception_distance import compute_kid
from .miou import compute_miou
from .precision_recall import compute_pr
from .perceptual_path_length import compute_ppl
from .inception_score import compute_is

_metric_dict = {}


def register_metric(fn):
    assert callable(fn)
    _metric_dict[fn.__name__] = fn
    return fn


def is_valid_metric(metric):
    return metric in _metric_dict


def list_valid_metrics():
    return list(_metric_dict.keys())


def calc_metric(metric, **kwargs):
    assert is_valid_metric(metric), f"unknown metric {metric}"
    opts = metric_utils.MetricOptions(**kwargs)
    start = time.time()
    results = _metric_dict[metric](opts)
    return dict(results=results, metric=metric,
                total_time=time.time() - start)


@register_metric
def fid50k_full(opts):
    return {"fid50k_full": compute_fid(opts, max_real=None, num_gen=50000)}


@register_metric
def fid2k(opts):
    """Cheap FID for in-training eval."""
    return {"fid2k": compute_fid(opts, max_real=2000, num_gen=2000)}


@register_metric
def kid50k_full(opts):
    return {"kid50k_full": compute_kid(opts, max_real=1000000, num_gen=50000)}


@register_metric
def kid2k(opts):
    return {"kid2k": compute_kid(opts, max_real=2000, num_gen=2000)}


@register_metric
def pr50k3_full(opts):
    return compute_pr(opts, max_real=200000, num_gen=50000, nhood_size=3)


@register_metric
def pr2k(opts):
    return compute_pr(opts, max_real=2000, num_gen=2000, nhood_size=3)


@register_metric
def ppl2_wend(opts):
    return {"ppl2_wend": compute_ppl(opts, num_samples=50000)}


@register_metric
def ppl2_wend_small(opts):
    return {"ppl2_wend_small": compute_ppl(opts, num_samples=500)}


@register_metric
def is50k(opts):
    mean, std = compute_is(opts, num_gen=50000, num_splits=10)
    return {"is50k_mean": mean, "is50k_std": std}


@register_metric
def eqt50k_int(opts):
    from .equivariance import compute_equivariance_metrics
    r = compute_equivariance_metrics(opts, num_samples=50000, batch_size=4,
                                     compute_eqt_int=True)
    return {"eqt50k_int": r["eqt_int"]}


@register_metric
def eqt50k_frac(opts):
    from .equivariance import compute_equivariance_metrics
    r = compute_equivariance_metrics(opts, num_samples=50000, batch_size=4,
                                     compute_eqt_frac=True)
    return {"eqt50k_frac": r["eqt_frac"]}


@register_metric
def eqr50k(opts):
    from .equivariance import compute_equivariance_metrics
    r = compute_equivariance_metrics(opts, num_samples=50000, batch_size=4,
                                     compute_eqr=True)
    return {"eqr50k": r["eqr"]}


@register_metric
def eq100(opts):
    """Cheap all-three equivariance eval for smoke testing / training."""
    from .equivariance import compute_equivariance_metrics
    return compute_equivariance_metrics(
        opts, num_samples=100, batch_size=4, compute_eqt_int=True,
        compute_eqt_frac=True, compute_eqr=True)


@register_metric
def miou500(opts):
    return compute_miou(opts, num_items=500)


@register_metric
def miou2k(opts):
    return compute_miou(opts, num_items=2000)
