"""Load the REAL reference ``openparse`` package inside this sandbox.

The reference (``/root/reference/src/openparse``) depends on PIL, pdfminer,
pypdf, fitz and tiktoken, none of which are installed here.  Its *transform
kernels* (``schemas.py`` + ``processing/basic_transforms.py`` +
``processing/semantic_transforms.py``), however, are pure
pydantic-plus-stdlib code — pydantic 2.x IS installed — so with a small
auto-stub meta-path hook for the missing binary deps the real reference
classes import and execute.  That unlocks a true *independent* differential:
``tests/test_reference_differential.py`` runs the reference's own
``ProcessingStep.process`` implementations side-by-side with
``open_parse_spark.core.transforms`` on randomized node sets, so parse
semantics no longer rest solely on ported goldens.

Scope guard: the stubs fabricate inert placeholder classes — anything that
actually *uses* PIL/pdfminer/pypdf/fitz behavior (real PDF IO, rasterize,
table detection) stays untestable here; only the node-level transform logic
(which never touches those libs, except CombineSlicedImages' PIL stitch, for
which we provide a tiny functional PIL.Image fake) is exercised.

The reference repo is untrusted public content: we import and *call* its
code in-process for testing only; nothing from it ships in the package.
"""

from __future__ import annotations

import importlib
import importlib.abc
import importlib.machinery
import importlib.util
import sys
import types

REF_SRC = "/root/reference/src"

#: top-level distributions the reference imports that are absent here
_STUB_ROOTS = ("PIL", "pdfminer", "pypdf", "fitz")


def _fab_class(qualname: str):
    """Fabricate a permissive placeholder class for an arbitrary attribute.

    Instances swallow any constructor args, any attribute access returns a
    fresh placeholder instance, and calling an instance returns another.
    Classes (not instances) are fabricated so ``List[LTPage]``-style
    annotations evaluated at def time keep working.
    """

    class _StubMeta(type):
        def __getattr__(cls, name):  # noqa: N805
            if name.startswith("__") and name.endswith("__"):
                raise AttributeError(name)
            value = _fab_class(f"{qualname}.{name}")
            setattr(cls, name, value)
            return value

    class _Stub(metaclass=_StubMeta):
        def __init__(self, *args, **kwargs):
            pass

        def __call__(self, *args, **kwargs):
            return _Stub()

        def __getattr__(self, name):
            if name.startswith("__") and name.endswith("__"):
                raise AttributeError(name)
            return _Stub()

    _Stub.__name__ = qualname.rsplit(".", 1)[-1]
    _Stub.__qualname__ = qualname
    return _Stub


class _StubModule(types.ModuleType):
    """Module whose attributes fabricate themselves on first access."""

    def __getattr__(self, name):
        if name.startswith("__") and name.endswith("__"):
            raise AttributeError(name)
        value = _fab_class(f"{self.__name__}.{name}")
        setattr(self, name, value)
        return value


class _FakePILImage:
    """Minimal functional PIL image: enough for the reference's
    ``CombineSlicedImages._combine_images_in_group`` (open → width/height →
    new → paste → save) to run deterministically."""

    def __init__(self, width: int = 1, height: int = 1, data: bytes = b""):
        self.width = width
        self.height = height
        self._data = data

    def paste(self, img, box):
        self._data += b"|%d,%d:" % box + img._data

    def save(self, fp, format=None):
        fp.write(b"FAKEPNG[%dx%d]" % (self.width, self.height) + self._data)


def _install_pil_image(module: types.ModuleType) -> None:
    def _open(fp):
        data = fp.read() if hasattr(fp, "read") else bytes(fp)
        return _FakePILImage(width=1, height=1, data=data)

    def _new(mode, size):
        return _FakePILImage(width=size[0], height=size[1], data=b"")

    def _frombytes(mode, size, data):
        return _FakePILImage(width=size[0], height=size[1], data=bytes(data))

    module.Image = _FakePILImage
    module.open = _open
    module.new = _new
    module.frombytes = _frombytes


class _StubFinder(importlib.abc.MetaPathFinder, importlib.abc.Loader):
    """Meta-path hook fabricating package stubs for the missing deps."""

    def __init__(self, roots):
        self.roots = frozenset(roots)

    def find_spec(self, fullname, path=None, target=None):
        if fullname.split(".", 1)[0] in self.roots:
            return importlib.machinery.ModuleSpec(
                fullname, self, is_package=True
            )
        return None

    def create_module(self, spec):
        mod = _StubModule(spec.name)
        mod.__path__ = []  # behaves as a package: submodule imports succeed
        return mod

    def exec_module(self, module):
        if module.__name__ == "PIL":
            # eagerly wire the functional Image fake so `from PIL import
            # Image` binds it (module __getattr__ would otherwise fabricate
            # an inert class first)
            img = _StubModule("PIL.Image")
            img.__path__ = []
            _install_pil_image(img)
            sys.modules["PIL.Image"] = img
            module.Image = img
        elif module.__name__ == "PIL.Image":
            _install_pil_image(module)


def _install_tiktoken_shim() -> None:
    """``tiktoken.get_encoding('cl100k_base').encode`` → the repo's own
    deterministic counter, so reference and repo token counts agree by
    construction (the differential tests transform logic, not BPE)."""
    if "tiktoken" in sys.modules and getattr(
        sys.modules["tiktoken"], "__open_parse_shim__", False
    ):
        return
    from open_parse_spark.core.tokens import num_tokens

    class _Encoding:
        @staticmethod
        def encode(text):
            return [0] * num_tokens(text)

    mod = types.ModuleType("tiktoken")
    mod.__open_parse_shim__ = True
    mod.get_encoding = lambda name: _Encoding()
    sys.modules["tiktoken"] = mod


_installed = False


def load_reference():
    """Import and return the real ``openparse`` package (or raise ImportError).

    Idempotent; installs the stub hook + tiktoken shim on first call.
    """
    global _installed
    if not _installed:
        missing = []
        for root in _STUB_ROOTS:
            try:
                if importlib.util.find_spec(root) is None:
                    missing.append(root)
            except (ImportError, ValueError):
                missing.append(root)
        if missing:
            sys.meta_path.insert(0, _StubFinder(missing))
        _install_tiktoken_shim()
        if REF_SRC not in sys.path:
            sys.path.append(REF_SRC)
        _installed = True
    import openparse  # noqa: F401

    importlib.import_module("openparse.processing.basic_transforms")
    importlib.import_module("openparse.processing.semantic_transforms")
    return sys.modules["openparse"]
