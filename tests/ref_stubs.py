"""Module stubs so reference torch modules import without their heavy deps.

The reference (under /root/reference, sys.path-appended by the parity tests)
needs pytorch_lightning / pyiqa / torchvision / compressai / torchac /
omegaconf at import time; none are installed here. These stubs supply the
exact surface the imported module graph touches so we can instantiate
NoiseEstimator / ControlModule / Compression and compare forwards.
"""
from __future__ import annotations

import sys
import types


def install_reference_stubs():
    import torch
    import torch.nn as nn

    def stub(name, **attrs):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    pl = stub("pytorch_lightning")

    class LightningModule(nn.Module):
        def save_hyperparameters(self, *a, **k):
            pass

        @property
        def device(self):
            # pl.LightningModule.device equivalent (reference process()
            # and RDEIC.__init__ read model.device)
            try:
                return next(self.parameters()).device
            except StopIteration:
                return torch.device("cpu")

    pl.LightningModule = LightningModule
    pl.Callback = object
    pl.seed_everything = lambda *a, **k: None
    stub("pytorch_lightning.utilities")
    stub("pytorch_lightning.utilities.types", EPOCH_OUTPUT=list)
    stub("pytorch_lightning.utilities.distributed", rank_zero_only=lambda f: f)

    stub(
        "pyiqa",
        create_metric=lambda *a, **k: (lambda *aa, **kk: torch.zeros(1)),
    )

    if "omegaconf" not in sys.modules:
        oc = stub("omegaconf")
        lc = stub("omegaconf.listconfig")

        class ListConfig(list):
            pass

        lc.ListConfig = ListConfig
        oc.listconfig = lc
        oc.ListConfig = ListConfig
        oc.OmegaConf = types.SimpleNamespace(to_container=lambda x, **k: x)

    tv = stub("torchvision")
    tv.__path__ = []

    class ToPILImage:
        def __call__(self, x):
            return x

    stub("torchvision.utils", make_grid=lambda *a, **k: torch.zeros(1))
    stub("torchvision.transforms", ToPILImage=ToPILImage)
    stub("torchvision.models")
    tv.utils = sys.modules["torchvision.utils"]
    tv.transforms = sys.modules["torchvision.transforms"]
    tv.models = sys.modules["torchvision.models"]

    ca = stub("compressai")
    ca.__path__ = []

    class _EntropyModel(nn.Module):
        pass

    class GaussianConditional(nn.Module):
        """Functional stand-in: likelihoods are dummy ones (parity tests
        compare deterministic tensors), but the CODING surface —
        update_scale_table / build_indexes / quantize and the cdf buffers —
        is real, backed by our own table builder (rdeic_tpu.ops.gaussian,
        itself parity-pinned against compressai's construction by
        tests/test_gaussian.py). This lets the reference's actual
        compress()/decompress() run end to end in the sandbox
        (tests/test_e2e_parity.py)."""

        def __init__(self, *a, **k):
            super().__init__()
            # real compressai EntropyModel/GaussianConditional buffers —
            # a released RDEIC checkpoint carries these names, so the
            # full-surface converter audit must see them (they are
            # rebuilt at load time by update(force=True), matching
            # reference inference.py:124)
            self.register_buffer("_offset", torch.zeros(0, dtype=torch.int32))
            self.register_buffer(
                "_quantized_cdf", torch.zeros(0, dtype=torch.int32)
            )
            self.register_buffer(
                "_cdf_length", torch.zeros(0, dtype=torch.int32)
            )
            self.register_buffer("scale_table", torch.zeros(0))

        def forward(self, inputs, scales, means=None, training=None):
            return inputs, torch.ones_like(inputs)

        # --- functional coding surface -------------------------------
        @property
        def quantized_cdf(self):
            return self._quantized_cdf

        @property
        def cdf_length(self):
            return self._cdf_length

        @property
        def offset(self):
            return self._offset

        def update_scale_table(self, scale_table, force=False):
            import numpy as np

            from rdeic_tpu.ops import gaussian as g

            st = np.asarray(scale_table, np.float64)
            cdf, lengths, offsets = g.build_cdf_tables(st)
            self._quantized_cdf = torch.from_numpy(
                np.asarray(cdf, np.int32))
            self._cdf_length = torch.from_numpy(
                np.asarray(lengths, np.int32))
            self._offset = torch.from_numpy(np.asarray(offsets, np.int32))
            self.scale_table = torch.from_numpy(st.astype(np.float32))
            return True

        def update(self, force=False):
            return False

        def build_indexes(self, scales):
            import numpy as np

            st = self.scale_table.numpy().astype(np.float64)
            s = np.maximum(scales.detach().numpy().astype(np.float64),
                           st[0])
            idx = (s[..., None] > st[:-1]).sum(-1).astype(np.int64)
            return torch.from_numpy(idx)

        def quantize(self, inputs, mode, means=None):
            assert mode == "symbols", mode
            v = inputs if means is None else inputs - means
            return torch.round(v)

    stub(
        "compressai.entropy_models",
        GaussianConditional=GaussianConditional,
        EntropyModel=_EntropyModel,
    )

    class CompressionModel(nn.Module):
        def update(self, force=False):
            return False

    stub("compressai.models", CompressionModel=CompressionModel)
    stub(
        "compressai.ops",
        quantize_ste=lambda x: (torch.round(x) - x).detach() + x,
    )

    # functional rANS adapters over OUR host coder (compressai API shape):
    # the reference's compress()/decompress() then emit/consume byte
    # streams produced by the exact coder our pipeline uses, so the e2e
    # parity test can assert byte equality, not just bpp proximity.
    class BufferedRansEncoder:
        def __init__(self):
            self._syms = []
            self._idxs = []
            self._table = None

        def encode_with_indexes(self, symbols, indexes, cdf, cdf_lengths,
                                offsets):
            import numpy as np

            from rdeic_tpu.entropy.coder import CdfTable

            self._syms.append(np.asarray(symbols, np.int32))
            self._idxs.append(np.asarray(indexes, np.int32))
            if self._table is None:
                self._table = CdfTable(
                    np.asarray(cdf, np.int32),
                    np.asarray(cdf_lengths, np.int32),
                    np.asarray(offsets, np.int32),
                )

        def flush(self):
            import numpy as np

            from rdeic_tpu.entropy.coder import rans_encode

            return rans_encode(
                np.concatenate(self._syms), np.concatenate(self._idxs),
                self._table,
            )

    class RansDecoder:
        def set_stream(self, stream):
            from rdeic_tpu.entropy.coder import RansDecoder as Dec

            self._dec = Dec()
            self._dec.set_stream(stream)

        def decode_stream(self, indexes, cdf, cdf_lengths, offsets):
            import numpy as np

            from rdeic_tpu.entropy.coder import CdfTable

            table = CdfTable(
                np.asarray(cdf, np.int32), np.asarray(cdf_lengths, np.int32),
                np.asarray(offsets, np.int32),
            )
            out = self._dec.decode_stream(np.asarray(indexes, np.int32),
                                          table)
            return out.tolist()

    stub("compressai.ans", BufferedRansEncoder=BufferedRansEncoder,
         RansDecoder=RansDecoder)

    def conv3x3(in_ch, out_ch, stride=1):
        return nn.Conv2d(in_ch, out_ch, 3, stride=stride, padding=1)

    stub("compressai.layers", conv3x3=conv3x3)

    # functional torchac stand-in: the reference's hyper latent is coded
    # against a UNIFORM cdf (utils/ckbd.py compute_cdf_uniform_prob), for
    # which fixed-width packing is the same byte count our pack_uniform
    # produces — so both frameworks' hyper strings compare byte-equal.
    def _tac_encode(cdf, sym, check_input_bounds=False):
        import numpy as np

        from rdeic_tpu.entropy.coder import pack_uniform

        k = int(cdf.shape[-1]) - 1
        return pack_uniform(np.asarray(sym, np.int64), k)

    def _tac_decode(cdf, data):
        import numpy as np

        from rdeic_tpu.entropy.coder import unpack_uniform

        k = int(cdf.shape[-1]) - 1
        shape = tuple(cdf.shape[:-1])
        n = int(np.prod(shape))
        out = unpack_uniform(data, n, k).reshape(shape)
        return torch.from_numpy(np.asarray(out, np.int16))

    stub("torchac", encode_float_cdf=_tac_encode,
         decode_float_cdf=_tac_decode)

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
