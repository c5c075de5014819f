"""MIL model zoo (flax.linen) — every model consumes batched padded bags.

Registry mirrors the reference's ``build_mil`` string keys
(reference: modules/__init__.py:56-175): ``abmil``, ``gabmil``, ``meanmil``,
``maxmil``, ``transmil``, ``dsmil``, ``clam_sb``, ``clam_mb``, ``dtfd``,
``ibmil``, ``rrtmil``, ``2dmamba``, ``mhim``, ``mhim_pure``.
"""

from .registry import build_model, register_model, MODEL_REGISTRY

__all__ = ["build_model", "register_model", "MODEL_REGISTRY"]
