"""Load the PyTorch reference implementation for parity checks.

The reference (`train_bisinger/`) imports a number of audio packages
(librosa, pycwt, pyloudnorm, ...) at module import time that are not
needed to *construct or run* its nn.Modules on random tensors. This
loader inserts inert stub modules for whatever is missing, puts the
reference root on `sys.path`, and drives its own `utils.hparams.set_hparams`
config cascade (`train_bisinger/utils/hparams.py:24-123`) so reference
modules see exactly the hparams they were written against.

Everything degrades gracefully: `reference_available()` is False when
torch or the checkout is absent, and the parity tests skip.
"""

from __future__ import annotations

import contextlib
import importlib
import os
import sys
import types
from typing import Any, Dict, Optional

REF_ROOT = os.environ.get("BISINGER_REF", "/root/reference/train_bisinger")

# modules the reference imports at module scope but which pure-tensor
# parity runs never call into
_MAYBE_MISSING = [
    "librosa",
    "librosa.filters",
    "librosa.core",
    "webrtcvad",
    "pyloudnorm",
    "parselmouth",
    "pyworld",
    "resemblyzer",
    "g2p_en",
    "pypinyin",
    "matplotlib",
    "matplotlib.pyplot",
    "skimage",
    "skimage.transform",
    "textgrid",
    "jieba",
    "pydub",
    "tqdm",
]


class _AnyAttr:
    """Attribute/call sink for stubbed module internals."""

    def __getattr__(self, k):
        return _AnyAttr()

    def __call__(self, *a, **kw):
        return _AnyAttr()

    def __iter__(self):
        return iter(())


_INSTALLED_STUBS: set = set()


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    mod.__bisinger_stub__ = True
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    _INSTALLED_STUBS.add(name)
    return mod


def remove_stubs() -> None:
    """Drop our stub modules from sys.modules so the rest of the process
    sees the real import errors again (our own code gates features on
    `import parselmouth` etc. succeeding). Reference modules keep working:
    they captured the stub objects at import time."""
    for name in list(_INSTALLED_STUBS):
        if getattr(sys.modules.get(name), "__bisinger_stub__", False):
            del sys.modules[name]
        _INSTALLED_STUBS.discard(name)


def reference_available() -> bool:
    if not os.path.isdir(REF_ROOT):
        return False
    try:
        import torch  # noqa: F401
    except Exception:
        return False
    return True


def install_stubs() -> None:
    """Stub the reference's optional deps that are absent here."""
    for name in _MAYBE_MISSING:
        if name in sys.modules:
            continue
        try:
            importlib.import_module(name)
        except Exception:
            _stub(name)
    # `from pycwt import wavelet` needs the attribute to exist
    if "pycwt" not in sys.modules:
        try:
            importlib.import_module("pycwt")
        except Exception:
            _stub("pycwt", wavelet=_AnyAttr())
    # tqdm must be callable-and-iterable if some path touches it
    tq = sys.modules.get("tqdm")
    if tq is not None and not hasattr(tq, "tqdm"):
        tq.tqdm = lambda x=None, *a, **kw: x if x is not None else _AnyAttr()


@contextlib.contextmanager
def _chdir(path: str):
    old = os.getcwd()
    os.chdir(path)
    try:
        yield
    finally:
        os.chdir(old)


class Reference:
    """Handle over the imported reference package."""

    def __init__(self, hparams: Dict[str, Any]):
        self.hparams = hparams

    # lazy module accessors ------------------------------------------------
    @property
    def fs2_module(self):
        return importlib.import_module("modules.fastspeech.fs2")

    @property
    def fs2midi_module(self):
        return importlib.import_module("modules.diffsinger_midi.fs2")

    @property
    def tts_modules(self):
        return importlib.import_module("modules.fastspeech.tts_modules")

    @property
    def diffnet_module(self):
        return importlib.import_module("usr.diff.net")

    @property
    def diffusion_module(self):
        return importlib.import_module("usr.diff.shallow_diffusion_tts")

    @property
    def pe_module(self):
        return importlib.import_module("modules.fastspeech.pe")

    class FakeDictionary:
        """Duck-type of the reference's phone dictionary: only `len()` and
        `.pad()` are consumed by model constructors (`fs2.py:25-33`)."""

        def __init__(self, size: int, pad_idx: int = 0):
            self._size = size
            self._pad = pad_idx

        def __len__(self):
            return self._size

        def pad(self):
            return self._pad


def load_reference(
    config: str = "usr/configs/m4-detect-ori-shift/fs2.yaml",
    overrides: Optional[Dict[str, Any]] = None,
) -> Reference:
    """Import the reference and set its global hparams from `config`.

    Returns a `Reference` whose `.hparams` is the same (mutable, global)
    dict the reference modules read — mutate with care between tests.
    """
    assert reference_available(), "reference checkout or torch missing"
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    install_stubs()
    try:
        with _chdir(REF_ROOT):  # base_config paths resolve relative to the root
            hp_mod = importlib.import_module("utils.hparams")
            hp_mod.set_hparams(config=config, print_hparams=False)
            # eager-import every module we expose while the stubs are live,
            # then remove the stubs so unrelated code sees real imports
            for target in [
                "modules.fastspeech.fs2",
                "modules.fastspeech.tts_modules",
                "modules.diffsinger_midi.fs2",
                "usr.diff.net",
                "usr.diff.shallow_diffusion_tts",
                "modules.fastspeech.pe",
            ]:
                importlib.import_module(target)
            # shallow_diffusion_tts captures hparams AT IMPORT TIME
            # (`linear_beta_schedule`'s max_beta default, line 44) — reload
            # it so the just-loaded config's values are baked in, exactly
            # as a fresh `python run.py --config <config>` would see them
            importlib.reload(sys.modules["usr.diff.shallow_diffusion_tts"])
    finally:
        remove_stubs()
    if overrides:
        hp_mod.hparams.update(overrides)
    return Reference(hp_mod.hparams)
