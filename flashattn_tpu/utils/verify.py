"""Numerical verification utilities.

Port of the reference verifier semantics (``code/_verify_func.py:3-40``):
max/mean abs error, max rel error, allclose-style normalized error, cosine
similarity; PASS iff allclose(rtol, atol) AND cosine > cos_threshold.

Defaults match the reference gate (rtol=1e-2, atol=1e-3, cosine>0.999) which
was calibrated for fp16 on GPU; bf16 has 8 fewer mantissa bits, so callers
testing bf16 kernels pass a looser atol with the same normalized-error
methodology (SURVEY.md §7 "numerics gates at bf16").
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class VerifyReport:
    passed: bool
    allclose: bool
    cosine: float
    max_abs_err: float
    mean_abs_err: float
    max_rel_err: float
    max_normalized_err: float

    def __str__(self) -> str:  # pragma: no cover - cosmetic
        status = "PASS" if self.passed else "FAIL"
        return (
            f"[{status}] allclose={self.allclose} cos={self.cosine:.6f} "
            f"max_abs={self.max_abs_err:.3e} mean_abs={self.mean_abs_err:.3e} "
            f"max_rel={self.max_rel_err:.3e} max_norm={self.max_normalized_err:.3f}"
        )


def verify_results(
    reference,
    output,
    rtol: float = 1e-2,
    atol: float = 1e-3,
    cos_threshold: float = 0.999,
    name: str = "",
    verbose: bool = False,
) -> VerifyReport:
    """Compare `output` against `reference` with the reference repo's metrics.

    Mirrors ``_verify_func.py``: all metrics computed in float32/float64 on
    host; normalized error is |out - ref| / (atol + rtol*|ref|) (``:17-20``);
    pass criterion at ``:35-40``.
    """
    ref = np.asarray(jnp.asarray(reference).astype(jnp.float32))
    out = np.asarray(jnp.asarray(output).astype(jnp.float32))
    assert ref.shape == out.shape, f"shape mismatch {ref.shape} vs {out.shape}"

    # Exactly-equal positions (including matching ±inf, e.g. LSE = -inf for
    # zero-key rows) count as zero error; replace so inf-inf doesn't NaN the
    # metrics. np.allclose already treats equal infinities as close.
    eq = ref == out
    ref = np.where(eq, 0.0, ref)
    out = np.where(eq, 0.0, out)

    abs_err = np.abs(out - ref)
    max_abs = float(abs_err.max())
    mean_abs = float(abs_err.mean())
    max_rel = float((abs_err / (np.abs(ref) + 1e-5)).max())
    max_norm = float((abs_err / (atol + rtol * np.abs(ref))).max())

    denom = np.linalg.norm(ref.ravel()) * np.linalg.norm(out.ravel())
    if denom == 0.0:
        # Both residuals are zero (arrays element-wise identical).
        cosine = 1.0 if not abs_err.any() else 0.0
    else:
        cosine = float(np.dot(ref.ravel(), out.ravel()) / denom)

    ok_allclose = bool(np.allclose(out, ref, rtol=rtol, atol=atol))
    passed = ok_allclose and cosine > cos_threshold
    report = VerifyReport(
        passed=passed,
        allclose=ok_allclose,
        cosine=cosine,
        max_abs_err=max_abs,
        mean_abs_err=mean_abs,
        max_rel_err=max_rel,
        max_normalized_err=max_norm,
    )
    if verbose:  # pragma: no cover - cosmetic
        print(f"{name}: {report}")
    return report
