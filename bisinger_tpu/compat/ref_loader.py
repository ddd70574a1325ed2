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
import importlib.util
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

    @property
    def hifigan_module(self):
        # The reference has a LATENT CIRCULAR IMPORT:
        # `modules/parallel_wavegan/layers/__init__.py:1` imports
        # residual_stack.py, whose `from . import CausalConv1d` reads the
        # not-yet-populated package — `import modules.hifigan.hifigan`
        # fails from a clean interpreter even in the reference checkout.
        # Pre-register the package and exec its submodules in dependency
        # order so the relative import resolves.
        pkg_name = "modules.parallel_wavegan.layers"
        if pkg_name not in sys.modules:
            # pqmf.py imports `kaiser` from scipy.signal, which moved to
            # scipy.signal.windows in scipy >= 1.13
            try:
                import scipy.signal as _ss
                import scipy.signal.windows as _ssw

                if not hasattr(_ss, "kaiser"):
                    _ss.kaiser = _ssw.kaiser
            except ImportError:
                pass
            importlib.import_module("modules.parallel_wavegan")
            root = os.path.join(REF_ROOT, "modules", "parallel_wavegan", "layers")
            pkg = types.ModuleType(pkg_name)
            pkg.__path__ = [root]
            sys.modules[pkg_name] = pkg
            for sub in (
                "causal_conv",
                "pqmf",
                "residual_block",
                "upsample",
                "residual_stack",
            ):
                spec = importlib.util.spec_from_file_location(
                    f"{pkg_name}.{sub}", os.path.join(root, f"{sub}.py")
                )
                mod = importlib.util.module_from_spec(spec)
                sys.modules[f"{pkg_name}.{sub}"] = mod
                spec.loader.exec_module(mod)
                for k in dir(mod):
                    if not k.startswith("_"):
                        setattr(pkg, k, getattr(mod, k))
        return importlib.import_module("modules.hifigan.hifigan")

    @property
    def pwg_module(self):
        _ = self.hifigan_module  # installs the pwg-layers import fix
        return importlib.import_module(
            "modules.parallel_wavegan.models.parallel_wavegan"
        )

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
