"""v3 (xVAPitch) dataset pipeline: linear specs, d-vectors, priors datasets,
loss-sorted resampling.

Reference behavior:
- TTSDataset computes mel+linear per item per epoch on CPU
  (python/xvapitch/dataset.py:223-275) — here features cache once (linear spec
  via the fused TPU kernel), epochs stream from disk.
- read_datasets walks priors roots ``<lang>_<name>/metadata.csv`` and extracts
  missing speaker embeddings with the ResNet encoder (dataset.py:588-684).
- per-dataset embedding: KMeans main centroid + 9 style centroids cached to
  emb.txt / other_embs.txt (get_dataset_emb.py:7-66).
- loss-sorted gaussian resampling (calibrate_loss_sampling, dataset.py:164-220):
  sort items by accumulated loss, gauss(100, 50)/200 index sampling of 50%,
  doubled up.
"""
from __future__ import annotations

import os
import random
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from ..ops.stft import DEFAULT_MEL, MelConfig
from .audio_io import load_wav, resample
from .dataset import (Bucket, Utterance, atomic_savez, drop_known_corrupt,
                      heal_corrupt_item, read_metadata, sticky_mel_variant)
from .pitch import yin_f0

# v3 normalizes pitch with fixed xVASpeech stats (reference dataset.py:157-158)
XVASPEECH_PITCH_MEAN = 104.606
XVASPEECH_PITCH_STD = 123.4384

LANG_CODES = [
    "am", "ar", "da", "de", "el", "en", "es", "fi", "fr", "ha", "hi", "hu",
    "it", "jp", "ko", "la", "nl", "pl", "pt", "ro", "ru", "sw", "sv", "th",
    "tr", "uk", "vi", "wo", "yo", "zh", "mn",
]  # 31 languages (reference python/xvapitch/text/__init__.py:5-37)


def lang_to_id(lang: str) -> int:
    lang = (lang or "en").lower()
    return LANG_CODES.index(lang) if lang in LANG_CODES else LANG_CODES.index("en")


class XvaFeatureCache:
    """Per-utterance cache: tokens, linear spec, pitch, energy, wav samples."""

    def __init__(
        self,
        dataset_path: str,
        text_to_ids: Callable[[str], np.ndarray],
        lang: str = "en",
        mel_cfg: MelConfig = DEFAULT_MEL,
        use_pallas: Optional[bool] = None,
    ):
        self.dataset_path = dataset_path
        self.lang = lang
        self.lang_id = lang_to_id(lang)
        self.cache_dir = os.path.join(dataset_path, ".tpu_cache_v3")
        os.makedirs(self.cache_dir, exist_ok=True)
        self.mel_cfg = mel_cfg
        self.text_to_ids = text_to_ids
        self.items = read_metadata(dataset_path)
        drop_known_corrupt(self)
        if use_pallas is None:
            from .dataset import default_use_pallas

            use_pallas = default_use_pallas()
        self.use_pallas = use_pallas
        from .packed import PackedReader

        self._packed = PackedReader(self.cache_dir)

    def _cache_path(self, item: Utterance) -> str:
        return os.path.join(self.cache_dir, item.item_id + ".npz")

    def _decode_item(self, item: Utterance, heal: bool = True):
        """Wav samples for one item (postprocessed preferred) truncated to a
        hop multiple; None = corrupt, False = too short (skip silently).

        heal=False defers heal_corrupt_item to the caller — REQUIRED from
        thread-pool workers: healing mutates cache.items (read-filter-assign)
        and appends to corrupt_wavs.txt, neither of which is thread-safe.
        """
        post = os.path.join(self.dataset_path, "wavs_postprocessed",
                            os.path.basename(item.wav_path))
        src = post if os.path.exists(post) else item.wav_path
        try:
            y, _ = load_wav(src, target_sr=self.mel_cfg.sample_rate)
        except Exception:
            # a truncated postprocessed file must not cost us the intact
            # original — fall back before healing
            if src != item.wav_path:
                try:
                    y, _ = load_wav(item.wav_path,
                                    target_sr=self.mel_cfg.sample_rate)
                except Exception:
                    if heal:
                        heal_corrupt_item(self, item, bad_path=item.wav_path)
                    return None
            else:
                if heal:
                    heal_corrupt_item(self, item, bad_path=src)
                return None
        hop = self.mel_cfg.hop_length
        y = y[: len(y) // hop * hop]
        return y if len(y) >= hop * 40 else False  # skip sub-0.5s clips

    def build(self, progress=None, batched: Optional[bool] = None) -> None:
        import jax.numpy as jnp

        from ..ops.stft import linear_spectrogram
        from ..ops.pallas_stft import mel_spectrogram_pallas

        todo = [it for it in self.items if not os.path.exists(self._cache_path(it))]
        if batched is None:
            batched = os.environ.get("XVA_BATCHED_BUILD", "1") != "0"
        # one spectrogram variant per cache (dataset.sticky_mel_variant);
        # the batched featurizer runs the Pallas kernel for pallas caches
        variant = sticky_mel_variant(
            self.cache_dir, "pallas" if self.use_pallas else "fft")
        self.use_pallas = variant == "pallas"
        if batched and todo:
            # thread-pool decode + one device dispatch per length bucket
            # (mel/linear + YIN f0 + energy in a single jit — ops/features.py)
            from concurrent.futures import ThreadPoolExecutor

            from ..ops.features import featurize_batch

            try:
                done = 0
                CHUNK = 256
                with ThreadPoolExecutor(
                        max_workers=max(2, (os.cpu_count() or 2))) as ex:
                    for c0 in range(0, len(todo), CHUNK):
                        chunk_items = todo[c0: c0 + CHUNK]
                        decoded = list(ex.map(
                            lambda it: self._decode_item(it, heal=False),
                            chunk_items))
                        # heal on the MAIN thread (mutates items/corrupt list)
                        for it, y in zip(chunk_items, decoded):
                            if y is None:
                                heal_corrupt_item(self, it)
                        good = [(it, y) for it, y in zip(chunk_items, decoded)
                                if y is not None and y is not False]
                        feats = featurize_batch(
                            [y for _, y in good], self.mel_cfg, mode="linear",
                            use_pallas=self.use_pallas)
                        for (item, y), f in zip(good, feats):
                            pitch = np.where(
                                f["pitch"] > 0,
                                (f["pitch"] - XVASPEECH_PITCH_MEAN)
                                / XVASPEECH_PITCH_STD, 0.0).astype(np.float32)
                            atomic_savez(
                                self._cache_path(item),
                                linear=f["linear"], pitch=pitch,
                                energy=f["energy"],
                                tokens=np.asarray(
                                    self.text_to_ids(item.text), np.int32),
                                wav=y.astype(np.float32),
                                lang_id=np.int32(self.lang_id),
                            )
                            done += 1
                            if progress:
                                progress(done, len(todo))
                        # healed/too-short items count as processed too
                        done = c0 + len(chunk_items)
                        if progress:
                            progress(done, len(todo))
                self.pack()
                return
            except Exception:
                import logging

                logging.getLogger("xva").exception(
                    "batched v3 cache build failed — falling back to serial")

        for i, item in enumerate(todo):
            if os.path.exists(self._cache_path(item)):
                continue  # written by a partial batched pass above
            # decode policy shared with the batched path (postprocessed-wav
            # preference + fallback-before-heal + hop*40 skip) — _decode_item
            y = self._decode_item(item)
            if y is None or y is False:
                if progress:  # healed/too-short still count as processed
                    progress(i + 1, len(todo))
                continue
            hop = self.mel_cfg.hop_length
            if self.use_pallas:
                _, lin = mel_spectrogram_pallas(
                    jnp.asarray(y)[None], return_linear=True
                )
                lin = np.asarray(lin[0])
            else:
                lin = np.asarray(linear_spectrogram(jnp.asarray(y)[None])[0])
            lin = lin[:, : len(y) // hop]
            pitch = yin_f0(y, self.mel_cfg.sample_rate, self.mel_cfg.n_fft,
                           hop)[: lin.shape[1]]
            if len(pitch) < lin.shape[1]:
                pitch = np.pad(pitch, (0, lin.shape[1] - len(pitch)))
            pitch = np.where(
                pitch > 0,
                (pitch - XVASPEECH_PITCH_MEAN) / XVASPEECH_PITCH_STD,
                0.0,
            ).astype(np.float32)
            energy = np.linalg.norm(np.log(np.clip(lin, 1e-5, None)), axis=0)
            tokens = np.asarray(self.text_to_ids(item.text), np.int32)
            atomic_savez(
                self._cache_path(item),
                linear=lin.astype(np.float32),
                pitch=pitch,
                energy=energy.astype(np.float32),
                tokens=tokens,
                wav=y.astype(np.float32),
                lang_id=np.int32(self.lang_id),
            )
            if progress:
                progress(i + 1, len(todo))
        self.pack()

    def pack(self) -> None:
        """(Re)build the mmap pack from the per-item npzs (data/packed.py)."""
        from .packed import PackedReader, pack_cache

        pack_cache(self.cache_dir)
        self._packed = PackedReader(self.cache_dir)

    def load_item(self, item: Utterance) -> Optional[Dict[str, np.ndarray]]:
        if self._packed and item.item_id in self._packed:
            return self._packed.load(item.item_id)
        p = self._cache_path(item)
        if not os.path.exists(p):
            return None
        with np.load(p) as z:
            return {k: z[k] for k in z.files}


def extract_speaker_embeddings(
    dataset_path: str,
    speaker_encoder=None,
    use_postprocessed: bool = False,
    progress=None,
) -> int:
    """Extract per-item speaker embeddings to ``se_embs/<name>.npy``
    (reference dataset.py read_datasets:649-668 / get_embedding:346-359)."""
    if speaker_encoder is None:
        from ..models.speaker_encoder import SpeakerEncoder

        speaker_encoder = SpeakerEncoder()
    wav_dir = os.path.join(
        dataset_path, "wavs_postprocessed" if use_postprocessed else "wavs"
    )
    if not os.path.isdir(wav_dir):
        wav_dir = os.path.join(dataset_path, "wavs")
    emb_dir = os.path.join(dataset_path, "se_embs")
    os.makedirs(emb_dir, exist_ok=True)
    items = read_metadata(dataset_path)
    done = 0
    for i, it in enumerate(items):
        name = os.path.splitext(os.path.basename(it.wav_path))[0]
        emb_path = os.path.join(emb_dir, name + ".npy")
        if os.path.exists(emb_path):
            done += 1
            continue
        wav_path = os.path.join(wav_dir, os.path.basename(it.wav_path))
        if not os.path.exists(wav_path):
            wav_path = it.wav_path
        try:
            y, sr = load_wav(wav_path)
            y16 = resample(y, sr, 16000)
            emb = speaker_encoder.compute_embedding(y16)
            np.save(emb_path, emb.astype(np.float32))
            done += 1
        except KeyboardInterrupt:
            raise
        except Exception:
            continue
        if progress:
            progress(i + 1, len(items))
    return done


def item_embedding_path(dataset_path: str, item: Utterance) -> str:
    name = os.path.splitext(os.path.basename(item.wav_path))[0]
    return os.path.join(dataset_path, "se_embs", name + ".npy")


def read_priors_datasets(
    languages: Sequence[str],
    dataset_roots: Sequence[str],
    speaker_encoder=None,
    data_mult: int = 1,
    extract_embs: bool = True,
    progress=None,
):
    """Walk priors roots for ``<lang>_<name>/metadata.csv`` datasets,
    extracting missing per-item speaker embeddings
    (reference dataset.py read_datasets:588-684).

    Returns (dataset_dirs, languages_loaded)."""
    langs = set(languages)
    all_datasets: List[str] = []
    languages_loaded = set()
    for root in dataset_roots:
        if os.path.exists(os.path.join(root, "metadata.csv")):
            all_datasets.append(root)
        for fname in sorted(os.listdir(root)):
            sub = os.path.join(root, fname)
            if ("." not in fname and "_" in fname
                    and fname.split("_")[0] in langs
                    and os.path.exists(os.path.join(sub, "metadata.csv"))):
                all_datasets.append(sub)
                languages_loaded.add(fname.split("_")[0])
    if extract_embs:
        for di, d in enumerate(all_datasets):
            extract_speaker_embeddings(d, speaker_encoder)
            if progress:
                progress(di + 1, len(all_datasets))
    return all_datasets * max(1, data_mult), sorted(languages_loaded)


def language_weights(langs: Sequence[str]) -> np.ndarray:
    """Inverse-frequency sampling weights per item
    (reference util.py get_language_weighted_sampler:403-410)."""
    langs = list(langs)
    unique = sorted(set(langs))
    counts = {u: langs.count(u) for u in unique}
    return np.asarray([1.0 / counts[l] for l in langs], np.float64)


def get_dataset_embedding(
    dataset_path: str,
    speaker_encoder=None,
    n_clusters: int = 10,
    max_files: int = 60,
) -> Dict[str, np.ndarray]:
    """Main-voice centroid + style centroids, cached to emb.txt/other_embs.txt
    (reference python/xvapitch/get_dataset_emb.py:7-66)."""
    emb_path = os.path.join(dataset_path, "emb.txt")
    other_path = os.path.join(dataset_path, "other_embs.txt")
    if os.path.exists(emb_path) and os.path.exists(other_path):
        main = np.loadtxt(emb_path, delimiter=",")
        others = np.loadtxt(other_path, delimiter=",")
        return {"main": main.astype(np.float32), "others": others.astype(np.float32)}

    if speaker_encoder is None:
        from ..models.speaker_encoder import SpeakerEncoder

        speaker_encoder = SpeakerEncoder()
    items = read_metadata(dataset_path)[:max_files]
    embs = []
    for it in items:
        y, sr = load_wav(it.wav_path)
        y16 = resample(y, sr, 16000)
        embs.append(speaker_encoder.compute_embedding(y16))
    embs = np.stack(embs)
    k = min(n_clusters, len(embs))
    if k >= 2:
        from sklearn.cluster import KMeans

        km = KMeans(n_clusters=k, n_init=4, random_state=0).fit(embs)
        counts = np.bincount(km.labels_, minlength=k)
        main = km.cluster_centers_[counts.argmax()]
        others = np.delete(km.cluster_centers_, counts.argmax(), axis=0)
    else:
        main = embs.mean(axis=0)
        others = embs[:1]
    np.savetxt(emb_path, main[None], delimiter=",")
    np.savetxt(other_path, others, delimiter=",")
    return {"main": main.astype(np.float32), "others": others.astype(np.float32)}


def get_similar_priors(
    target_emb: np.ndarray,
    priors_root: str,
    top_k: int = 12,
    speaker_encoder=None,
) -> List[str]:
    """Rank priors datasets (<lang>_<name> dirs) by embedding similarity to the
    finetune voice (reference get_dataset_emb.py get_similar_priors:71-151 —
    faiss there; jax matmul top-k here)."""
    import jax.numpy as jnp

    dirs = sorted(
        os.path.join(priors_root, d)
        for d in os.listdir(priors_root)
        if os.path.isdir(os.path.join(priors_root, d))
        and os.path.exists(os.path.join(priors_root, d, "metadata.csv"))
    )
    embs, names = [], []
    for d in dirs:
        e = get_dataset_embedding(d, speaker_encoder)["main"]
        embs.append(e)
        names.append(d)
    if not embs:
        return []
    E = np.stack(embs)
    E = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-8)
    q = target_emb / max(np.linalg.norm(target_emb), 1e-8)
    sims = np.asarray(jnp.asarray(E) @ jnp.asarray(q))
    order = np.argsort(-sims)[:top_k]
    return [names[i] for i in order]


# Default viz sentences (role of the reference's viz_sentences.json)
VIZ_SENTENCES = [
    "This is what my voice sounds like.",
    "The quick brown fox jumps over the lazy dog.",
    "How much wood would a woodchuck chuck?",
]


def loss_sorted_resample(
    loss_by_item: Dict[str, float], rng: Optional[random.Random] = None
) -> List[str]:
    """Gaussian mid-band resampling of loss-sorted items
    (reference dataset.py calibrate_loss_sampling:164-220)."""
    rng = rng or random.Random(1234)
    ranked = sorted(loss_by_item.items(), key=lambda kv: kv[1])
    n = len(ranked)
    target = int(n * 0.5)
    picked: List[int] = []
    it = 0
    while len(picked) < target and it < 100000:
        it += 1
        v = rng.gauss(100, 50)
        if 0 <= v < 200:
            idx = int(v / 200 * n)
            if idx not in picked:
                picked.append(idx)
    picked = picked + picked  # double up (reference :211)
    return [ranked[i][0] for i in picked]


DEFAULT_V3_BUCKETS = (
    Bucket(64, 256),
    Bucket(96, 384),
    Bucket(128, 512),
    Bucket(192, 768),
)


class XvaBatcher:
    """Static-shape v3 batches over one or more XvaFeatureCaches."""

    def __init__(
        self,
        caches: Sequence[XvaFeatureCache],
        batch_size: int,
        d_vector: np.ndarray,
        buckets: Sequence[Bucket] = DEFAULT_V3_BUCKETS,
        seed: int = 0,
        hop: int = 256,
    ):
        self.caches = list(caches)
        self.batch_size = batch_size
        self.d_vector = np.asarray(d_vector, np.float32)
        self.buckets = sorted(buckets, key=lambda b: b.mel_len)
        self.rng = np.random.default_rng(seed)
        self.hop = hop
        self.use_item_embs = True   # per-item se_embs/*.npy when present
        self.weighted_by_language = False
        # device_spec (set by XVAPitchTrainer from XvaTrainConfig): don't
        # collate the (B, mel_len, 513) f32 linear spec at all — the train
        # step recomputes it on device from the waveform (trainer
        # _materialize_spec) — and ship the wav as int16. Cuts the feed from
        # ~150 MB to ~25 MB per B=128/384-frame batch and skips the 100 MB
        # host read+transpose of the cached spec.
        self.device_spec = False
        self._emb_cache: Dict[str, np.ndarray] = {}
        self._index: List = []  # (cache, item)
        for c in self.caches:
            for it in c.items:
                if os.path.exists(c._cache_path(it)):
                    self._index.append((c, it))
        self._active = list(self._index)
        # (dataset_path, item_id) -> (text_len, spec_len): priors batchers
        # span many datasets and bare filenames (0001.wav-style) collide
        self._lengths: Dict[tuple, tuple] = {}
        # per-bucket batches must stay divisible by the mesh's data axis
        self.batch_divisor = 1

    def __len__(self):
        """Number of batches in one (unshuffled) epoch plan — bucket batch
        sizes vary, so count the actual plan."""
        plans = self._plan(list(self._active))
        n = sum(
            int(np.ceil(len(v) / self.batch_size_for(b)))
            for b, v in plans.items() if v
        )
        return max(1, n)

    # decoder/discriminator activations scale with batch alone (they see
    # fixed-size segments per item), so cap the short-bucket scale-up at 2x
    # the tuned batch — B=2x at the half-length bucket is the measured-safe
    # envelope (bench_train.py: B=128@384f fits, B=256@384f OOMs on v5e)
    MAX_BUCKET_SCALE = 2.0

    def batch_size_for(self, b: Bucket) -> int:
        """Memory-constant per-bucket batch size (bounded).

        Posterior/flow activation memory scales with batch×frames, so hold
        their product constant across buckets: ``batch_size`` is the batch at
        the LARGEST bucket (the memory bound) and shorter buckets scale up
        inversely with mel length (same idea as the reference's file-length
        batch multiplier, fastpitch1_1/xva_train.py:401-403), clamped to
        MAX_BUCKET_SCALE for the segment-path terms.
        """
        max_len = self.buckets[-1].mel_len  # sorted ascending in __init__
        scale = min(max_len / b.mel_len, self.MAX_BUCKET_SCALE)
        n = int(round(self.batch_size * scale))
        d = max(1, self.batch_divisor)
        n = max(d, (max(1, n) // d) * d)
        return n

    @staticmethod
    def item_key(cache, item) -> str:
        """Collision-safe item name (bare stems collide across priors
        datasets): '<dataset_path>::<item_id>'."""
        return f"{cache.dataset_path}::{item.item_id}"

    def resample_by_loss(self, loss_by_item: Dict[str, float]):
        names = loss_sorted_resample(loss_by_item)
        by_name = {self.item_key(c, it): (c, it) for c, it in self._index}
        self._active = [by_name[n] for n in names if n in by_name]
        if not self._active:
            self._active = list(self._index)

    def _item_emb(self, cache: "XvaFeatureCache", item: Utterance):
        if not self.use_item_embs:
            return None
        p = item_embedding_path(cache.dataset_path, item)
        if p in self._emb_cache:
            return self._emb_cache[p]
        emb = None
        if os.path.exists(p):
            emb = np.load(p).astype(np.float32).reshape(-1)
        self._emb_cache[p] = emb
        return emb

    def _plan(self, order) -> Dict[Bucket, List]:
        """Assign items to buckets, memoizing lengths so each npz is read only
        once across all epochs (bucketing itself is cheap integer work)."""
        plans: Dict[Bucket, List] = {b: [] for b in self.buckets}
        for c, it in order:
            key = (c.dataset_path, it.item_id)
            lens = self._lengths.get(key)
            if lens is None:
                d = c.load_item(it)
                if d is None:
                    continue
                lens = (len(d["tokens"]), d["linear"].shape[1])
                self._lengths[key] = lens
            tl, sl = lens
            for b in self.buckets:
                if tl <= b.text_len and sl <= b.mel_len:
                    plans[b].append((c, it))
                    break
        return plans

    def mean_batch_size(self) -> float:
        """Average micro-batch size over one epoch plan — the right divisor
        for gradient-accumulation gam now that batches are bucket-sized
        (gam = ceil(target_bs / mean) keeps the effective batch ≈ target)."""
        plans = self._plan(list(self._active))
        items = sum(len(v) for v in plans.values())
        batches = sum(
            int(np.ceil(len(v) / self.batch_size_for(b)))
            for b, v in plans.items() if v
        )
        return items / batches if batches else float(self.batch_size)

    def epoch(self, shuffle: bool = True):
        order = list(self._active)
        if shuffle and self.weighted_by_language:
            # inverse language-frequency sampling with replacement
            # (reference util.py:403-410 WeightedRandomSampler semantics)
            langs = [c.lang for c, _ in order]
            w = language_weights(langs)
            idx = self.rng.choice(len(order), size=len(order), replace=True,
                                  p=w / w.sum())
            order = [order[i] for i in idx]
        elif shuffle:
            self.rng.shuffle(order)
        plans = self._plan(order)
        batches = []
        for b, items in plans.items():
            bs = self.batch_size_for(b)
            for s in range(0, len(items), bs):
                chunk = items[s : s + bs]
                batches.append((b, chunk))
        if shuffle:
            self.rng.shuffle(batches)
        for b, chunk in batches:
            yield self.collate(b, chunk)

    def collate(self, b: Bucket, chunk) -> Dict[str, np.ndarray]:
        n = self.batch_size_for(b)
        # Partial tail chunks: repeat real items to fill the static batch.
        # All-zero dummy rows would inject silence gradients into the mel L1,
        # adversarial and discriminator losses every epoch.
        ids = [self.item_key(c, it) for c, it in chunk]
        if 0 < len(chunk) < n:
            chunk = [chunk[i % len(chunk)] for i in range(n)]
        # one npz read per UNIQUE item — tail-filled chunks repeat rows
        loaded: Dict[str, Dict[str, np.ndarray]] = {}
        tokens = np.zeros((n, b.text_len), np.int32)
        tlens = np.ones((n,), np.int32)
        linear = (None if self.device_spec
                  else np.zeros((n, b.mel_len, 513), np.float32))
        slens = np.ones((n,), np.int32)
        pitch = np.zeros((n, 1, b.mel_len), np.float32)
        energy = np.zeros((n, b.mel_len), np.float32)
        wav_dtype = np.int16 if self.device_spec else np.float32
        wav = np.zeros((n, b.mel_len * self.hop, 1), wav_dtype)
        lang = np.zeros((n,), np.int32)
        dvec = np.tile(self.d_vector[None], (n, 1))
        for i, (c, it) in enumerate(chunk):
            k = self.item_key(c, it)
            d = loaded.get(k)
            if d is None:
                d = loaded[k] = c.load_item(it)
            tl = min(len(d["tokens"]), b.text_len)
            sl = min(d["linear"].shape[1], b.mel_len)
            tokens[i, :tl] = d["tokens"][:tl]
            tlens[i] = max(tl, 1)
            if linear is not None:
                linear[i, :sl] = d["linear"][:, :sl].T
            slens[i] = max(sl, 1)
            pitch[i, 0, :sl] = d["pitch"][:sl]
            energy[i, :sl] = d["energy"][:sl]
            w = d["wav"][: sl * self.hop]
            if self.device_spec:
                # symmetric int16: device dequant is wav/32767 (trainer
                # _materialize_spec); round-trip error ≤ 1.5e-5 (−96 dB)
                w = np.round(np.clip(w, -1.0, 1.0) * 32767.0).astype(np.int16)
            wav[i, : len(w), 0] = w
            lang[i] = int(np.asarray(d["lang_id"]).reshape(-1)[0])
            emb = self._item_emb(c, it)
            if emb is not None and emb.shape == dvec[i].shape:
                dvec[i] = emb
        out = {
            "tokens": tokens, "tlens": tlens, "slens": slens,
            "pitch": pitch, "energy": energy, "wav": wav, "dvec": dvec,
            "lang": lang, "ids": ids,
        }
        if linear is not None:
            out["linear"] = linear
        return out
