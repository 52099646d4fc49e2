"""Top-level encoder: frame loop, headers, CABAC serialization, Annex-B.

Counterpart of the reference's TEncTop/TEncGOP/TEncSlice pipeline
(TEncTop.cpp:323, TEncGOP.cpp:1077, TEncSlice.cpp:641 — SURVEY.md §3.1)
for the all-intra path; the GOP/inter machinery extends this in
codec/inter_enc.py. Per frame: device/batched analysis+recon, then host
serialization, MD5 SEI, NAL packing.
"""

from __future__ import annotations

import dataclasses
import time
from dataclasses import dataclass, field

import numpy as np

from ..entropy import bitio, headers
from ..entropy.cabac import CabacEncoder, ContextSet
from ..entropy.native import encode_slice_data_native
from ..entropy.syntax import encode_slice_data
from ..utils.yuv import picture_md5, psnr
from .params import B_SLICE, I_SLICE, P_SLICE, EncoderConfig
from .recon import encode_frame_intra


@dataclass
class FrameResult:
    poc: int
    bits: int
    psnr_y: float
    psnr_u: float
    psnr_v: float
    md5: list = field(default_factory=list)
    seconds: float = 0.0


class Encoder:
    """All-intra HEVC encoder (round-1 scope: IDR every frame)."""

    def __init__(self, cfg: EncoderConfig, frame_encoder=None):
        self.cfg = cfg
        if cfg.sps.scaling_list_enabled and cfg.intra_period != 1:
            raise NotImplementedError(
                "scaling lists: all-intra encodes only (decode supports "
                "inter streams)")
        cfg.pps.init_qp = cfg.qp
        cfg.pps.deblocking_disabled = not cfg.deblocking
        if cfg.adaptive_qp:
            cfg.pps.cu_qp_delta_enabled = True
        self.nals: list[bytes] = []
        self.first_of_au: list[bool] = []
        self.results: list[FrameResult] = []
        self._wrote_ps = False
        # {slice QP: end-of-slice CABAC states} from written P slices —
        # feeds the grid scan's adaptive bit-estimator re-freeze
        self.ctx_feedback: dict = {}
        self._hrd_dec_idx = 0  # AU decode index (HRD timing SEIs)
        self._hrd_bp_idx = 0   # decode index of the last buffering period
        if cfg.sps.hrd_enabled and cfg.target_bitrate:
            cfg.sps.hrd_bitrate = cfg.target_bitrate
        if frame_encoder is None and cfg.intra_qt:
            from .intra_qt import encode_frame_intra_qt

            frame_encoder = encode_frame_intra_qt
        elif (frame_encoder is None and cfg.inter_backend == "jax"
                and not cfg.pps.sign_data_hiding):
            from .intra_jax import encode_frame_intra_jax

            frame_encoder = encode_frame_intra_jax
        self._frame_encoder = frame_encoder or encode_frame_intra
        self.dpb_recon = None  # previous frame recon (single-ref LD-P)
        self._nn_cache: dict = {}
        self.nn_params = self._nn_for_qp(cfg.qp)
        # steady-state LD-P RPS published in the SPS; slices reference it
        # by index (TEncCavlc SPS RPS list) instead of re-coding it
        if cfg.intra_period == -1 and cfg.gop_structure == "ldp":
            n = max(1, cfg.num_ref_frames)
            self._sps_rps = [headers.ShortTermRPS(
                [-(i + 1) for i in range(n)], [1] * n)]
        else:
            self._sps_rps = []

    def _slice_type(self, poc: int) -> int:
        ip = self.cfg.intra_period
        if poc == 0 or ip == 1 or (ip > 0 and poc % ip == 0):
            return I_SLICE
        return P_SLICE

    def frame_qp(self, poc: int) -> int:
        cfg = self.cfg
        if getattr(self, "_rc_qp", None) is not None:
            return self._rc_qp  # rate control owns the picture QP
        if self._slice_type(poc) == I_SLICE or not cfg.gop_qp_offsets:
            return cfg.qp
        off = cfg.gop_qp_offsets[(poc - 1) % len(cfg.gop_qp_offsets)]
        return min(max(cfg.qp + off, 0), 51)

    def _nn_for_qp(self, qp: int):
        """NN-FME weights for a frame. The reference selects the weight
        set ONCE from the base config QP (TEncSearch.cpp:472
        m_pcEncCfg->getQP()), NOT the per-frame QP — GOP QP offsets must
        not silently reroute every P frame to the QP22 fallback set."""
        if self.cfg.fme_mode != "nn":
            return None
        qp = self.cfg.qp
        p = self._nn_cache.get(qp)
        if p is None and qp not in self._nn_cache:
            cfg_qp = dataclasses.replace(self.cfg, qp=qp)
            p = _load_nn_params(cfg_qp)
            self._nn_cache[qp] = p
        return self._nn_cache.get(qp)

    def _emit(self, nal: bytes, first_of_au: bool = False) -> None:
        self.nals.append(nal)
        self.first_of_au.append(first_of_au)

    def encode_frame(self, y: np.ndarray, u: np.ndarray, v: np.ndarray,
                     poc: int, precomputed=None,
                     slice_info: dict | None = None) -> FrameResult:
        cfg, sps, pps = self.cfg, self.cfg.sps, self.cfg.pps
        t0 = time.time()
        if not self._wrote_ps:
            self._emit(bitio.make_nal(bitio.NAL_VPS, headers.write_vps(sps)))
            self._emit(bitio.make_nal(
                bitio.NAL_SPS, headers.write_sps(sps, self._sps_rps or None)))
            self._emit(bitio.make_nal(bitio.NAL_PPS, headers.write_pps(pps)))
            from ..entropy import sei

            self._emit(bitio.make_nal(bitio.NAL_PREFIX_SEI, sei.write_sei_nal([
                sei.ActiveParameterSets(sps_ids=[0]),
                sei.UserDataUnregistered(data=b"tpuhevc"),
            ])))
            self._wrote_ps = True
        aus = []
        if slice_info is None and self._slice_type(poc) == I_SLICE \
                and poc > 0:
            from ..entropy import sei

            aus.append(sei.RecoveryPoint(recovery_poc_cnt=0))
        if sps.hrd_enabled:
            # HRD timing SEIs (SEIEncoder counterparts): buffering
            # period on IRAP AUs, CPB/DPB delays on every AU
            from ..entropy import sei

            is_irap = poc == 0 or (slice_info is None
                                   and self._slice_type(poc) == I_SLICE)
            if is_irap:
                aus.append(sei.BufferingPeriod(
                    initial_cpb_removal_delay=90000,
                    initial_cpb_removal_offset=0))
                self._hrd_bp_idx = self._hrd_dec_idx
            aus.append(sei.PicTiming(
                with_hrd=True,
                au_cpb_removal_delay_minus1=max(
                    0, self._hrd_dec_idx - self._hrd_bp_idx - 1),
                pic_dpb_output_delay=max(
                    0, poc + sps.num_reorder_pics - self._hrd_dec_idx)))
            self._hrd_dec_idx += 1
        elif sps.vui_timing:
            from ..entropy import sei

            aus.append(sei.PicTiming())
        if aus:
            from ..entropy import sei

            self._emit(bitio.make_nal(bitio.NAL_PREFIX_SEI,
                                      sei.write_sei_nal(aus)))

        if slice_info is not None:
            stype = slice_info["stype"]
            fqp = slice_info["qp"]
        else:
            stype = self._slice_type(poc)
            fqp = self.frame_qp(poc)
        stats = None
        if precomputed is not None:
            if len(precomputed) == 3:
                fs, recon, stats = precomputed
                ry = ru = rv = None
            else:
                fs, (ry, ru, rv) = precomputed
        elif stype == I_SLICE:
            # rate control may override the picture QP (frame_qp), so the
            # analysis must run at fqp, not the base cfg QP
            cfg_i = dataclasses.replace(cfg, qp=fqp) if fqp != cfg.qp else cfg
            fs, (ry, ru, rv) = self._frame_encoder(y, u, v, cfg_i)
        else:
            from .inter_enc import encode_frame_p
            from .params import p_frame_lambda

            G = max(1, len(cfg.gop_qp_offsets))
            lam_f = (getattr(self, "_rc_lambda", None)
                     or p_frame_lambda(cfg, (poc - 1) % G, fqp))
            cfg_f = dataclasses.replace(cfg, qp=fqp, frame_lambda=lam_f)
            if (cfg.adaptive_qp and cfg.ctu_qp_map is None
                    and cfg.inter_backend == "np"):
                from .preanalysis import adaptive_qp_map

                cfg_f = dataclasses.replace(
                    cfg_f, ctu_qp_map=adaptive_qp_map(
                        np.asarray(y), fqp, sps.ctu_size, cfg.aq_range))
            fs, (ry, ru, rv) = encode_frame_p(
                (y, u, v), self.dpb_recon, cfg_f, self._nn_for_qp(fqp),
                backend=cfg.inter_backend)
            if cfg_f.ctu_qp_map is not None:
                # CTU-level RC: signal the map via cu_qp_delta. CTUs
                # with no coded residual can't carry the delta — resolve
                # to the QPs the stream will actually convey so deblock
                # matches the decoder (effective_qp_ctu docstring).
                from ..entropy.syntax import effective_qp_ctu

                fs.qp_ctu = effective_qp_ctu(
                    fs, np.asarray(cfg_f.ctu_qp_map, np.int32), fqp,
                    sps.ctu_size, wpp=pps.entropy_coding_sync)

        if (cfg.deblocking and ry is not None
                and not getattr(fs, "prefiltered", False)):
            from ..ops.deblock import deblock_frame

            ry, ru, rv = deblock_frame((ry, ru, rv), fs, fqp,
                                       stype == I_SLICE,
                                       bd=sps.bit_depth)
        if sps.sao_enabled and ry is not None and fs.sao is None:
            from .recon import _pad_to
            from .sao_enc import apply_sao_picture, decide_sao_params

            w_, h_ = sps.coded_width, sps.coded_height
            org = (_pad_to(np.asarray(y), h_, w_),
                   _pad_to(np.asarray(u), h_ // 2, w_ // 2),
                   _pad_to(np.asarray(v), h_ // 2, w_ // 2))
            from .params import i_frame_lambda, p_frame_lambda

            if getattr(self, "_rc_lambda", None):
                lam_f = self._rc_lambda
            elif stype == I_SLICE:
                lam_f = i_frame_lambda(cfg, fqp)
            else:
                G = max(1, len(cfg.gop_qp_offsets))
                lam_f = p_frame_lambda(cfg, (poc - 1) % G, fqp)
            fs.sao = decide_sao_params(org, (ry, ru, rv), sps.ctu_size,
                                       fqp, sps.bit_depth, lam=lam_f)
            ry, ru, rv = apply_sao_picture((ry, ru, rv), fs.sao,
                                           sps.ctu_size, sps.bit_depth)

        max_merge = cfg.max_num_merge_cand
        if slice_info is not None and stype != I_SLICE:
            hdr = headers.SliceHeader(
                slice_type=stype, nal_type=bitio.NAL_TRAIL_R, poc=poc,
                qp=fqp, rps=slice_info["rps"],
                num_ref_idx_l0=slice_info["num_ref_l0"],
                num_ref_idx_l1=slice_info.get("num_ref_l1", 0),
                five_minus_max_num_merge_cand=5 - max_merge,
            )
            init_row = stype  # 0 = B, 1 = P (reference init-table layout)
        elif stype == I_SLICE:
            hdr = headers.SliceHeader(
                slice_type=I_SLICE, nal_type=bitio.NAL_IDR_W_RADL, poc=poc,
                qp=fqp,
            )
            init_row = 2
        else:
            n_ref = max(1, min(poc, cfg.num_ref_frames))
            if fs.ref_idx is not None and fs.ref_idx.max() >= n_ref:
                n_ref = int(fs.ref_idx.max()) + 1
            hdr = headers.SliceHeader(
                slice_type=P_SLICE, nal_type=bitio.NAL_TRAIL_R, poc=poc,
                qp=fqp,
                rps=headers.ShortTermRPS([-(i + 1) for i in range(n_ref)],
                                         [1] * n_ref),
                num_ref_idx_l0=n_ref,
                five_minus_max_num_merge_cand=5 - max_merge,
            )
            init_row = 1
            hdr.temporal_mvp = sps.temporal_mvp_enabled
        if fs.sao is not None:
            hdr.sao_luma = fs.sao.luma_on
            hdr.sao_chroma = fs.sao.chroma_on
        if pps.weighted_pred and stype == P_SLICE:
            from .wp import WpParams

            hdr.wp_l0 = getattr(fs, "wp_l0", None) or WpParams().identity(
                hdr.num_ref_idx_l0)
        if pps.weighted_bipred and stype == B_SLICE:
            from .wp import WpParams

            hdr.wp_l0 = WpParams().identity(hdr.num_ref_idx_l0)
            hdr.wp_l1 = WpParams().identity(hdr.num_ref_idx_l1)
        if (stype != I_SLICE and getattr(self, "_sps_rps", None)
                and hdr.rps is not None):
            for i, r in enumerate(self._sps_rps):
                if (r.delta_pocs == hdr.rps.delta_pocs
                        and r.used == hdr.rps.used):
                    hdr.rps_sps_idx = i
                    break
        n_ref_slice = hdr.num_ref_idx_l0 if stype != I_SLICE else 1
        n_ref_l1 = hdr.num_ref_idx_l1 if stype == B_SLICE else 0
        l0d = l1d = None
        if slice_info is not None:
            l0d = slice_info.get("l0_deltas")
            l1d = slice_info.get("l1_deltas")
        if pps.entropy_coding_sync:
            from ..entropy.syntax import encode_slice_data_wpp

            subs = encode_slice_data_wpp(
                fs, sps, pps, init_row, fqp, stype, max_merge,
                num_ref=n_ref_slice, ref_deltas=l0d,
                num_ref_l1=n_ref_l1, l1_deltas=l1d, slice_qp=fqp)
            # entry points count EBSP bytes (§7.4.7.1): account for the
            # emulation-prevention bytes make_nal will insert
            hdr.entry_points = bitio.rbsp_entry_sizes_to_ebsp(
                subs[:-1])
            w = headers.write_slice_header(
                hdr, sps, pps, num_sps_rps=len(getattr(self, "_sps_rps", [])))
            for s in subs:
                w.write_bytes(s)
        elif pps.tiles_enabled or cfg.slice_ctus > 0:
            # one independent slice segment per tile / per fixed CTU
            # count (TEncSlice.cpp:650 boundary semantics): fresh CABAC
            # engine + slice header per segment, segment_address = its
            # first CTU in raster scan
            from .tiles import segment_spans, spans_block_order

            spans = segment_spans(sps, pps, cfg.slice_ctus)
            cell_order = spans_block_order(sps, spans)
            n_sps_rps = len(getattr(self, "_sps_rps", []))
            for ti, span in enumerate(spans):
                hdr_t = dataclasses.replace(
                    hdr, first_slice=(ti == 0), segment_address=span[0])
                w = headers.write_slice_header(hdr_t, sps, pps,
                                               num_sps_rps=n_sps_rps)
                ctx = ContextSet(init_row, fqp)
                cab = CabacEncoder(ctx)
                encode_slice_data(cab, fs, sps, pps, stype, max_merge,
                                  num_ref=n_ref_slice, ref_deltas=l0d,
                                  num_ref_l1=n_ref_l1, l1_deltas=l1d,
                                  slice_qp=fqp, ctu_addrs=span,
                                  cell_order=cell_order)
                cab.finish()
                w.write_bytes(bytes(cab.out))
                val, nbits = cab.pending_bits
                w.write(val, nbits)
                w.rbsp_trailing_bits()
                self._emit(bitio.make_nal(hdr.nal_type, w.getvalue()),
                           first_of_au=(ti == 0))
            bits = sum((len(self.nals[-1 - i]) + 4) * 8
                       for i in range(len(spans)))
            w = None
        else:
            w = headers.write_slice_header(
                hdr, sps, pps, num_sps_rps=len(getattr(self, "_sps_rps", [])))
            # intra-in-P and rectangular PUs ride the native v3 coder;
            # encode_slice_data_native itself returns None for frames
            # whose features exceed it (NxN, RQT, transform-skip)
            ctx_snap = np.zeros(256, np.int32)
            payload = (None if stype == B_SLICE else
                       encode_slice_data_native(fs, sps, pps, init_row, fqp,
                                                stype, max_merge,
                                                n_ref_slice,
                                                ctx_out=ctx_snap))
            if payload is not None:  # native fast path (byte-identical)
                w.write_bytes(payload)
                if stype == P_SLICE and ctx_snap.any():
                    # end-of-slice context snapshot: the adaptive
                    # bit-estimator feedback (grid_live_tables)
                    self.ctx_feedback[fqp] = ctx_snap
            else:
                ctx = ContextSet(init_row, fqp)
                cab = CabacEncoder(ctx)
                encode_slice_data(cab, fs, sps, pps, stype, max_merge,
                                  num_ref=n_ref_slice, ref_deltas=l0d,
                                  num_ref_l1=n_ref_l1, l1_deltas=l1d,
                                  slice_qp=fqp)
                cab.finish()
                w.write_bytes(bytes(cab.out))
                val, nbits = cab.pending_bits
                w.write(val, nbits)
                w.rbsp_trailing_bits()
                if stype == P_SLICE:
                    self.ctx_feedback[fqp] = np.asarray(ctx.states,
                                                        np.int32)
        if w is not None:
            self._emit(bitio.make_nal(hdr.nal_type, w.getvalue()),
                       first_of_au=True)
            bits = (len(self.nals[-1]) + 4) * 8

        # decoded-picture-hash SEI (suffix) + per-frame stats
        if stats is not None:  # device-computed (checksum hash + SSE)
            hashes, htype = stats["hashes"], stats["hash_type"]
            maxv = (1 << sps.bit_depth) - 1

            def _ps(sse, npx):
                return (999.99 if sse == 0
                        else 10.0 * np.log10(maxv * maxv * npx / sse))

            npx = sps.coded_width * sps.coded_height
            psnrs = (_ps(float(stats["sse"][0]), npx),
                     _ps(float(stats["sse"][1]), npx // 4),
                     _ps(float(stats["sse"][2]), npx // 4))
            self.dpb_recon = None
        else:
            if cfg.hash_type == "checksum":
                from ..utils.yuv import picture_checksum

                hashes, htype = picture_checksum(ry, ru, rv, sps.bit_depth), 2
            elif cfg.hash_type == "crc":
                from ..utils.yuv import picture_crc

                hashes, htype = picture_crc(ry, ru, rv, sps.bit_depth), 1
            else:
                hashes, htype = picture_md5(ry, ru, rv, sps.bit_depth), 0
            psnrs = (psnr(y, ry[: y.shape[0], : y.shape[1]], sps.bit_depth),
                     psnr(u, ru[: u.shape[0], : u.shape[1]], sps.bit_depth),
                     psnr(v, rv[: v.shape[0], : v.shape[1]], sps.bit_depth))
            self.dpb_recon = (ry, ru, rv)
        self._emit(bitio.make_nal(
            bitio.NAL_SUFFIX_SEI,
            headers.write_picture_hash_sei(hashes, htype)))

        res = FrameResult(
            poc=poc, bits=bits, psnr_y=psnrs[0], psnr_u=psnrs[1],
            psnr_v=psnrs[2], md5=hashes, seconds=time.time() - t0,
        )
        self.results.append(res)
        self._recon = (ry, ru, rv) if ry is not None else None
        return res

    def bitstream(self) -> bytes:
        return bitio.write_annexb(self.nals, self.first_of_au)

    # --- checkpoint / resume (SURVEY.md §5: encoder state = next POC +
    # DPB recon + rate-control trajectory; small and explicit, so long
    # multi-host runs survive preemption) -------------------------------
    def save_checkpoint(self, path: str) -> None:
        import json
        import zlib

        state = {
            "next_poc": len(self.results),
            "first_of_au": self.first_of_au,
            "results": [(r.poc, r.bits, r.psnr_y, r.psnr_u, r.psnr_v,
                         [h.hex() for h in r.md5]) for r in self.results],
            "wrote_ps": self._wrote_ps,
        }
        blobs = [zlib.compress(n) for n in self.nals]
        with open(path, "wb") as f:
            hdr = json.dumps(state).encode()
            f.write(len(hdr).to_bytes(4, "little") + hdr)
            f.write(len(blobs).to_bytes(4, "little"))
            for b in blobs:
                f.write(len(b).to_bytes(4, "little") + b)
            if self.dpb_recon is not None:
                f.write(b"\x01")
                for pl in self.dpb_recon:
                    a = np.ascontiguousarray(pl, dtype=np.int32)
                    f.write(np.asarray(a.shape, np.int32).tobytes())
                    f.write(a.tobytes())
            else:
                f.write(b"\x00")

    def load_checkpoint(self, path: str) -> int:
        """Restores state; returns the next POC to encode."""
        import json
        import zlib

        with open(path, "rb") as f:
            n = int.from_bytes(f.read(4), "little")
            state = json.loads(f.read(n).decode())
            nb = int.from_bytes(f.read(4), "little")
            self.nals = []
            for _ in range(nb):
                ln = int.from_bytes(f.read(4), "little")
                self.nals.append(zlib.decompress(f.read(ln)))
            has_dpb = f.read(1) == b"\x01"
            if has_dpb:
                planes = []
                for _ in range(3):
                    sh = np.frombuffer(f.read(8), np.int32)
                    planes.append(np.frombuffer(
                        f.read(int(sh[0]) * int(sh[1]) * 4), np.int32
                    ).reshape(sh[0], sh[1]).copy())
                self.dpb_recon = tuple(planes)
        self.first_of_au = state["first_of_au"]
        self._wrote_ps = state["wrote_ps"]
        self.results = [
            FrameResult(poc=r[0], bits=r[1], psnr_y=r[2], psnr_u=r[3],
                        psnr_v=r[4], md5=[bytes.fromhex(h) for h in r[5]])
            for r in state["results"]]
        return state["next_poc"]


def encode_sequence(reader, cfg: EncoderConfig, max_frames: int | None = None,
                    frame_encoder=None, verbose: bool = False,
                    device_batch: int = 0):
    """device_batch > 0 uses the vmapped multi-frame device path (one
    device call + one fetch per batch), overlapping host serialization."""
    enc = Encoder(cfg, frame_encoder=frame_encoder)
    n = max_frames if max_frames is not None else cfg.frames
    frames = []
    for i in range(n):
        fr = reader.read_frame(i)
        if fr is None:
            break
        frames.append(fr)
    recons = []

    def _finish(i, fr, pre=None, slice_info=None):
        res = enc.encode_frame(*fr, poc=i, precomputed=pre,
                               slice_info=slice_info)
        recons.append(enc._recon)
        if verbose:
            print(
                f"POC {res.poc:4d} I-SLICE QP {cfg.qp} {res.bits:8d} bits "
                f"[Y {res.psnr_y:.4f} U {res.psnr_u:.4f} V {res.psnr_v:.4f}] "
                f"{res.seconds:.2f}s"
            )

    if device_batch > 0 and cfg.intra_period == 1 and not cfg.intra_qt:
        from .intra_jax import encode_frames_intra_jax_batch

        for s in range(0, len(frames), device_batch):
            chunk = frames[s : s + device_batch]
            if len(chunk) < device_batch:  # pad to compiled batch size
                chunk = chunk + [chunk[-1]] * (device_batch - len(chunk))
            pre = encode_frames_intra_jax_batch(chunk, cfg)
            for j, p in enumerate(pre[: min(device_batch, len(frames) - s)]):
                _finish(s + j, frames[s + j], p)
    elif cfg.target_bitrate > 0:
        _rate_controlled(enc, cfg, frames, _finish)
    elif cfg.gop_structure == "ra" and len(frames) > 1:
        if cfg.gop_table:
            _gop_table_driven(enc, cfg, frames, _finish)
        else:
            _ra_gop4(enc, cfg, frames, _finish)
    elif (cfg.intra_period == -1 and cfg.inter_backend == "jax"
          and len(frames) > 1 and not cfg.intra_in_inter
          and ((not cfg.pps.sign_data_hiding and not cfg.rdoq
                and not cfg.deblocking and not cfg.sps.sao_enabled
                and cfg.fme_mode != "dctif")
               or _grid_supports(cfg))):
        if cfg.tmvp and _grid_supports(cfg):
            # TMVP rides the native col decision walk only; anything
            # short of that must not claim it in the SPS (the python
            # fallback walk derives spatial-only lists)
            from ..entropy.native import get_lib

            lib = get_lib()
            if lib is not None and hasattr(
                    lib, "tpuhevc_decision_walk_map_col"):
                cfg.sps.temporal_mvp_enabled = True
        _ldp_scan_pipelined(enc, cfg, frames, _finish)
    else:
        for i, fr in enumerate(frames):
            _finish(i, fr)
    return enc, recons


def _grid_supports(cfg) -> bool:
    from . import inter_grid

    return inter_grid.supports(cfg)


def _rate_controlled(enc, cfg, frames, finish):
    """Picture-level R-lambda rate control (RateControl=1): QP per frame
    from the model, model updated with actual bits (TEncRateCtrl
    counterpart; SURVEY.md §2.2). Rides the regular coding structure —
    the anchor's multi-ref LD-P GOP included — via the encoder's
    _rc_qp/_rc_lambda overrides instead of forcing IPPP, matching
    TEncGOP.cpp:1821-1831 (RC supplies QP+lambda, the GOP machinery
    supplies structure). With cfg.rc_ctu (LCULevelRC) the picture target
    is further distributed over CTUs by activity and the per-CTU QPs
    ride cu_qp_delta."""
    from .params import I_SLICE
    from .ratectrl import CtuAlloc, RateControl

    sps = cfg.sps
    rc = RateControl(cfg.target_bitrate, cfg.frame_rate, sps.coded_width,
                     sps.coded_height, len(cfg.gop_qp_offsets) or 4,
                     len(frames))
    alloc = None
    if cfg.rc_ctu:
        cfg.pps.cu_qp_delta_enabled = True  # before the PPS is written
        alloc = CtuAlloc(sps.coded_width, sps.coded_height, sps.ctu_size)
    for i, fr in enumerate(frames):
        stype = enc._slice_type(i)
        qp, lam, target = rc.pick(i, stype == I_SLICE)
        enc._rc_qp, enc._rc_lambda = qp, lam
        try:
            if alloc is not None and stype != I_SLICE:
                level = rc._pending[0]
                a, b = rc._model(level)
                m = alloc.qp_map(target, qp,
                                 a, b, alloc.weights(fr[0],
                                                     frames[i - 1][0]))
                enc.cfg = dataclasses.replace(cfg, ctu_qp_map=m)
                finish(i, fr)
                enc.cfg = cfg
            else:
                finish(i, fr)
        finally:
            enc._rc_qp = enc._rc_lambda = None
        rc.update(enc.results[-1].bits)


def _gop_table_driven(enc, cfg, frames, finish):
    """GOP-table-driven hierarchical structure: slice types, QP offsets,
    temporal order, and RPS come straight from the parsed cfg GOP table
    (config.options.GopEntry rows, Frame1..FrameN = decode order).
    Counterpart of TEncGOP::compressGOP's table traversal
    (TEncGOP.cpp:1077-1321) with the ref lists truncated to one active
    picture per list (legal num_ref_idx override; the RPS keeps every
    table reference alive in the DPB so HM replays the full hierarchy
    hash-exact). First-GOP entries whose references precede POC 0 are
    trimmed like TEncTop's initial-RPS adjustment."""
    from ..entropy.headers import ShortTermRPS
    from .inter_b import encode_frame_b

    table = list(cfg.gop_table)
    G = len(table)
    n = len(frames)
    cfg.sps.num_reorder_pics = max(cfg.sps.num_reorder_pics,
                                   max(1, G - 1))
    max_refs = max((len(e.ref_pics) for e in table), default=1)
    cfg.sps.max_dec_pic_buffering = max(cfg.sps.max_dec_pic_buffering,
                                        max_refs + 2)
    dpb: dict = {}

    finish(0, frames[0])
    dpb[0] = enc._recon
    last_coded = 0
    base = 0
    while base + G < n:
        for e in table:
            poc = base + e.poc_offset
            if poc >= n:
                continue
            qp = min(max(cfg.qp + e.qp_offset, 0), 51)
            # trim refs that precede the IDR or were never coded (the
            # first GOPs reference pictures that do not exist yet)
            deltas = [d for d in e.ref_pics if (poc + d) in dpb]
            if not deltas:
                deltas = [last_coded - poc]
            past = sorted((poc + d for d in deltas if d < 0), reverse=True)
            fut = sorted(poc + d for d in deltas if d > 0)
            l0_poc = past[0] if past else fut[0]
            l1_poc = fut[0] if fut else past[0]
            rps = ShortTermRPS(deltas, [1] * len(deltas))
            if e.slice_type == "B":
                fs, recon = encode_frame_b(
                    frames[poc], dpb[l0_poc], dpb[l1_poc], cfg, qp,
                    [l0_poc], [l1_poc], poc, enc._nn_for_qp(qp))
                si = dict(stype=B_SLICE, qp=qp, rps=rps,
                          num_ref_l0=1, num_ref_l1=1,
                          l0_deltas=[poc - l0_poc],
                          l1_deltas=[poc - l1_poc])
                finish(poc, frames[poc], (fs, recon), si)
            else:
                enc.dpb_recon = dpb[l0_poc]
                si = dict(stype=P_SLICE, qp=qp, rps=rps,
                          num_ref_l0=1, l0_deltas=[poc - l0_poc])
                finish(poc, frames[poc], None, si)
            dpb[poc] = enc._recon
            last_coded = poc
            # DPB: exactly the decoder's — keep only pictures the
            # just-coded RPS names (plus the current picture)
            keep = {poc} | {poc + d for d in deltas}
            for p in [p for p in dpb if p not in keep]:
                dpb.pop(p)
        base += G
    # tail: plain LD-P chain from the last coded picture
    for poc in range(base + 1, n):
        if poc in dpb:
            continue
        qp = min(max(cfg.qp + (table[-1].qp_offset if table else 3), 0), 51)
        ref = max(p for p in dpb if p < poc)
        enc.dpb_recon = dpb[ref]
        si = dict(stype=P_SLICE, qp=qp,
                  rps=ShortTermRPS([ref - poc], [1]),
                  num_ref_l0=1, l0_deltas=[poc - ref])
        finish(poc, frames[poc], None, si)
        dpb[poc] = enc._recon


def _ra_gop4(enc, cfg, frames, finish):
    """Random-access hierarchical GOP4: decode order [b+4, b+2, b+1, b+3]
    with one reference per list for B pictures (key pictures are P).
    Counterpart of TEncGOP::compressGOP's RA traversal (TEncGOP.cpp:1077)
    with the encoder_randomaccess GOP-table structure collapsed to GOP4."""
    from ..entropy.headers import ShortTermRPS
    from .inter_b import encode_frame_b

    n = len(frames)
    cfg.sps.num_reorder_pics = max(cfg.sps.num_reorder_pics, 2)
    dpb: dict = {}

    def enc_b(poc, qp_off, l0_poc, l1_poc, rps_deltas, rps_used):
        qp = min(max(cfg.qp + qp_off, 0), 51)
        fs, recon = encode_frame_b(
            frames[poc], dpb[l0_poc], dpb[l1_poc], cfg, qp,
            [l0_poc], [l1_poc], poc, enc._nn_for_qp(qp))
        si = dict(stype=B_SLICE, qp=qp,
                  rps=ShortTermRPS(rps_deltas, rps_used),
                  num_ref_l0=1, num_ref_l1=1,
                  l0_deltas=[poc - l0_poc], l1_deltas=[poc - l1_poc])
        finish(poc, frames[poc], (fs, recon), si)
        dpb[poc] = enc._recon

    finish(0, frames[0])
    dpb[0] = enc._recon
    base = 0
    while base + 4 < n:
        b = base
        # key picture: P referencing the previous key
        qp = min(max(cfg.qp + 1, 0), 51)
        enc.dpb_recon = dpb[b]
        si = dict(stype=P_SLICE, qp=qp, rps=ShortTermRPS([-4], [1]),
                  num_ref_l0=1, l0_deltas=[4])
        finish(b + 4, frames[b + 4], None, si)
        dpb[b + 4] = enc._recon
        enc_b(b + 2, 2, b, b + 4, [-2, 2], [1, 1])
        enc_b(b + 1, 3, b, b + 2, [-1, 1, 3], [1, 1, 0])
        enc_b(b + 3, 3, b + 2, b + 4, [-1, 1], [1, 1])
        for p in (b, b + 1, b + 2, b + 3):  # no longer referenced
            dpb.pop(p, None)
        base += 4
    # tail: plain LD-P chain from the last key picture
    for poc in range(base + 1, n):
        qp = min(max(cfg.qp + 3, 0), 51)
        enc.dpb_recon = dpb.get(poc - 1, enc._recon)
        si = dict(stype=P_SLICE, qp=qp, rps=ShortTermRPS([-1], [1]),
                  num_ref_l0=1, l0_deltas=[1])
        finish(poc, frames[poc], None, si)
        dpb[poc] = enc._recon


class LdpScanDriver:
    """Chunked LD-P scan with explicit dispatch/collect halves so callers
    can overlap device compute with host serialization — and, with several
    drivers on several devices, overlap whole segments (parallel/segments).

    Protocol: num_chunks() times { dispatch(ci) ; collect() } — dispatch
    is async (device work + async fetch started), collect blocks on the
    previously dispatched chunk and serializes its frames via `finish`.
    """

    def __init__(self, enc, cfg, frames, finish, chunk_frames: int = 8):
        from . import inter_grid
        from .inter_batch import build_ldp_scan, collect_frame

        self.enc, self.frames, self.finish = enc, frames, finish
        sps = cfg.sps
        self.w, self.h = sps.coded_width, sps.coded_height
        offs = tuple(cfg.gop_qp_offsets) or (0,)
        G = len(offs)
        self.n_gops = max(1, chunk_frames // G)
        self.G = G
        self.K = self.n_gops * G
        qps = set(min(max(cfg.qp + o, 0), 51) for o in offs)
        nn_by_qp = {qp: enc._nn_for_qp(qp) for qp in qps}
        self.grid = inter_grid.supports(cfg)
        if self.grid and not cfg.fetch_recon:
            # the no-recon-fetch layout needs the native map walk
            from ..entropy.native import get_lib

            lib = get_lib()
            if lib is None or not hasattr(lib, "tpuhevc_decision_walk_map"):
                cfg = dataclasses.replace(cfg, fetch_recon=True)
        self.cfg = cfg
        if self.grid:
            self.fn, _, _ = inter_grid.build_ldp_grid_scan(
                cfg, nn_by_qp, self.n_gops)
            self.collect_fn = inter_grid.collect_grid_frame
        else:
            self.fn, _, _ = build_ldp_scan(cfg, nn_by_qp, self.n_gops)
            self.collect_fn = collect_frame
        self.R = max(1, cfg.num_ref_frames) if self.grid else 1
        self.use_wp = self.grid and cfg.pps.weighted_pred
        self.wp_by_poc: dict = {}
        self.refs = None
        self.pending: list = []
        self._col = None  # TMVP collocated motion of the last coded pic
        self.starts = list(range(0, len(frames) - 1, self.K))

    def num_chunks(self) -> int:
        return len(self.starts)

    def start(self):
        """Encode the leading IDR and stage the reference planes."""
        import jax.numpy as jnp

        self.finish(0, self.frames[0])  # IDR (device intra path)
        ry, ru, rv = (jnp.asarray(np.asarray(p, dtype=np.int32))
                      for p in self.enc.dpb_recon)
        if self.grid:
            ruv = jnp.concatenate([ru, rv], axis=1)
            self.refs = (jnp.repeat(ry[None], self.R, 0),
                         jnp.repeat(ruv[None], self.R, 0))
        else:
            self.refs = (ry, ru, rv)

    def _chunk_u8(self, blk):
        from .recon import _pad_to

        w, h = self.w, self.h
        rows = []
        for y, u, v in blk:
            rows.append(np.concatenate([
                _pad_to(np.asarray(y), h, w).astype(np.uint8).ravel(),
                _pad_to(np.asarray(u), h // 2, w // 2).astype(np.uint8).ravel(),
                _pad_to(np.asarray(v), h // 2, w // 2).astype(np.uint8).ravel(),
            ]))
        return np.stack(rows).reshape(self.n_gops, self.G, -1)

    def dispatch(self, ci: int) -> None:
        import jax.numpy as jnp

        s = self.starts[ci]
        pframes = self.frames[1:]
        blk = pframes[s : s + self.K]
        nvalid = len(blk)
        blk = blk + [blk[-1]] * (self.K - nvalid)
        if self.grid:
            from . import inter_grid

            nav = np.array([max(1, min(s + 1 + j, self.R))
                            for j in range(self.K)],
                           np.int32).reshape(self.n_gops, self.G)
            extra = ()
            if inter_grid._TUNE.get("adaptive_est", True):
                # adaptive bit-estimator re-freeze: decision tables
                # rebuilt from the last written P slice's end-of-slice
                # context states (2-chunk lag under the pipeline; the
                # first chunks ride the warmed frozen tables)
                extra = (inter_grid.grid_live_tables(
                    self.cfg, self.enc.ctx_feedback),)
            if self.use_wp:
                wp_args = self._wp_arrays(s)
                out = self.fn(jnp.asarray(self._chunk_u8(blk)),
                              jnp.asarray(nav), *wp_args, *self.refs,
                              *extra)
            else:
                out = self.fn(jnp.asarray(self._chunk_u8(blk)),
                              jnp.asarray(nav), *self.refs, *extra)
        else:
            out = self.fn(jnp.asarray(self._chunk_u8(blk)), *self.refs)
        buf, self.refs = out[0], out[1:]
        try:
            buf.copy_to_host_async()
        except Exception:
            pass
        self.pending.append((s, nvalid, buf))

    def _wp_arrays(self, s: int):
        """Per-frame explicit-WP parameters for one chunk: host-side
        DC/AC analysis against the reference *originals*
        (WeightPredAnalysis.cpp:246,398; the SAD select uses originals
        as the recon proxy — encoder choice, not conformance). Returns
        (wpw, wpo, wpd) shaped (n_gops, G, R, 3) / (n_gops, G)."""
        import jax.numpy as jnp

        from .wp import WpParams, analyse_slice_wp

        K, R = self.K, self.R
        wpw = np.zeros((K, R, 3), np.int32)
        wpo = np.zeros((K, R, 3), np.int32)
        wpd = np.full(K, 6, np.int32)
        npocs = len(self.frames)
        for j in range(K):
            poc = min(s + 1 + j, npocs - 1)
            nav = max(1, min(poc, R))
            cur = self.frames[poc]
            refs = [self.frames[poc - 1 - r] for r in range(nav)]
            wp = analyse_slice_wp(cur, refs, bit_depth=8)
            self.wp_by_poc[poc] = wp
            d = wp.denom_y
            wpd[j] = d
            wpw[j, :, :] = 1 << d
            for r in range(nav):
                wpw[j, r] = wp.weights[r]
                wpo[j, r] = wp.offsets[r]
        return (jnp.asarray(wpw.reshape(self.n_gops, self.G, R, 3)),
                jnp.asarray(wpo.reshape(self.n_gops, self.G, R, 3)),
                jnp.asarray(wpd.reshape(self.n_gops, self.G)))

    def collect(self) -> None:
        """Serialize the oldest in-flight chunk (blocks on its fetch)."""
        from . import inter_grid
        from .inter_enc import assemble_frame_p

        if not self.pending:
            return
        ps, pnv, pbuf = self.pending.pop(0)
        rows = np.asarray(pbuf)
        tmvp = self.grid and self.cfg.sps.temporal_mvp_enabled
        for j in range(pnv):
            poc = ps + 1 + j
            n_ref = max(1, min(poc, self.R))
            cfg_f = dataclasses.replace(self.cfg, qp=self.enc.frame_qp(poc))
            col = None
            if tmvp:
                # collocated motion = previous coded picture's final
                # 16x16-compressed MV field (ColMotion twin; the IDR
                # contributes an all-invalid field)
                if self._col is None:
                    h16 = (self.h // 8 + 1) // 2
                    w16 = (self.w // 8 + 1) // 2
                    self._col = (np.zeros((h16, w16, 2), np.int32),
                                 np.zeros((h16, w16), np.int32))
                col = self._col
            pre = (inter_grid.assemble_grid_frame(cfg_f, rows[j], n_ref,
                                                  col=col)
                   if self.grid else None)
            if tmvp and pre is not None:
                fs = pre[0]
                self._col = (
                    np.ascontiguousarray(fs.mv[::2, ::2]).astype(np.int32),
                    np.where(fs.inter_dir[::2, ::2] != 0,
                             fs.ref_idx[::2, ::2] + 1, 0).astype(np.int32))
            if pre is None:
                per_cu = self.collect_fn(cfg_f, rows[j])
                pre = assemble_frame_p(cfg_f, per_cu, n_ref,
                                       agglomerate=not self.grid)
            if self.grid and cfg_f.deblocking:
                pre[0].prefiltered = True  # device stage already filtered
            if self.use_wp:
                pre[0].wp_l0 = self.wp_by_poc.pop(poc, None)
            self.finish(poc, self.frames[poc], pre)


def _ldp_scan_pipelined(enc, cfg, frames, finish, chunk_frames: int = 8):
    """LD-P loop batched through the tunnel: K frames per scan dispatch
    (one upload, one compact fetch), recon chained on device, host
    serialization of chunk i overlapped with device compute of chunk i+1."""
    drv = LdpScanDriver(enc, cfg, frames, finish, chunk_frames)
    drv.start()
    n = drv.num_chunks()
    for ci in range(n):
        drv.dispatch(ci)
        if ci > 0:  # serialize chunk ci-1 while chunk ci computes
            drv.collect()
    drv.collect()


def _load_nn_params(cfg: EncoderConfig):
    """Per-QP NN-FME weights: explicit dir (npz or CSV tree) or the
    reference DL export if mounted; None disables (falls back to integer)."""
    import os

    from ..models import nnfme

    d = cfg.nn_weights_dir
    if d and d.endswith(".npz") and os.path.exists(d):
        return nnfme.select_qp_params(nnfme.load_npz(d), cfg.qp)
    for root in ([d] if d else []) + ["/root/reference/DL/blowing"]:
        if root and os.path.isdir(root):
            qp_dir = os.path.join(root, str(cfg.qp))
            if not os.path.isdir(qp_dir):
                qp_dir = os.path.join(root, "22")  # reference QP fallback
            if os.path.isdir(qp_dir):
                return nnfme.load_csv_weights(qp_dir)
    return None
