"""MathWriting CSV+PNG dataset and a threaded prefetching loader.

Data contract matches the reference (data/README.md:3-10,
src/data_loader.py:13-47): ``{split}_labels.csv`` with columns
``image_filename, latex_label``; grayscale PNGs under
``{split}_formulas/``; each sample is the stretch-resized 96x320 image plus
``<sos> tokens <eos>`` ids padded/truncated to max_seq_len=150.

TPU-first loader design: instead of torch DataLoader worker *processes*
(src/data_loader.py:59-76 — needed because PIL transforms hold the GIL),
decode/resize runs in a thread pool (cv2 releases the GIL) feeding a
bounded prefetch queue; batches are uint8 and normalization + augmentation
happen ON DEVICE (data/augment.py), so host->HBM traffic is 4x smaller and
the augment rides the XLA graph. The C++ native loader (native/) can take
over the assembly loop when built.
"""

from __future__ import annotations

import concurrent.futures as cf
import os
import queue
import threading
from typing import Dict, Iterator, List

import numpy as np

from ..core.config import DataConfig, ModelConfig
from ..core.tokenizer import Tokenizer
from .preprocess import load_image_cv2


class MathFormulaDataset:
    """Index-able dataset of (image_u8 (H, W), caption (L,), length)."""

    def __init__(self, img_dir: str, label_path: str, tokenizer: Tokenizer,
                 img_h: int = 96, img_w: int = 320, max_seq_len: int = 150):
        import pandas as pd

        self.img_dir = img_dir
        self.df = pd.read_csv(label_path)
        self.tokenizer = tokenizer
        self.img_h, self.img_w = img_h, img_w
        self.max_seq_len = max_seq_len

    def __len__(self) -> int:
        return len(self.df)

    def __getitem__(self, idx: int):
        img_name = self.df.iloc[idx, 0]
        label = self.df.iloc[idx, 1]
        img = load_image_cv2(os.path.join(self.img_dir, img_name),
                             self.img_h, self.img_w)
        ids = self.tokenizer.encode(str(label), max_len=self.max_seq_len)
        length = min(
            len(self.tokenizer.encode(str(label))), self.max_seq_len)
        return img, np.asarray(ids, np.int32), length


class DataLoader:
    """Threaded prefetching batch loader.

    Yields dicts: ``image`` uint8 (B, H, W, 1), ``caption`` int32 (B, L),
    ``length`` int32 (B,). Set ``drop_remainder`` to keep batch shapes
    static for jit (the remainder batch is padded by repeating row 0 and
    ``valid`` marks real rows).
    """

    def __init__(self, dataset: MathFormulaDataset, batch_size: int,
                 shuffle: bool = False, seed: int = 0, num_workers: int = 4,
                 prefetch: int = 4, drop_remainder: bool = False,
                 pad_remainder: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_remainder = drop_remainder
        self.pad_remainder = pad_remainder
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_remainder:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self) -> List[np.ndarray]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        batches = []
        for i in range(0, n, self.batch_size):
            chunk = order[i:i + self.batch_size]
            if len(chunk) < self.batch_size and self.drop_remainder:
                continue
            batches.append(chunk)
        return batches

    def _assemble(self, pool: cf.ThreadPoolExecutor,
                  idxs: np.ndarray) -> Dict[str, np.ndarray]:
        samples = list(pool.map(self.dataset.__getitem__, idxs))
        B = len(samples)
        target = self.batch_size if self.pad_remainder else B
        H, W = self.dataset.img_h, self.dataset.img_w
        L = self.dataset.max_seq_len
        images = self._stack_images([s[0] for s in samples], target, H, W)
        captions = np.zeros((target, L), np.int32)
        lengths = np.zeros((target,), np.int32)
        valid = np.zeros((target,), bool)
        for j, (_, ids, ln) in enumerate(samples):
            captions[j] = ids
            lengths[j] = ln
            valid[j] = True
        if B < target:  # pad by repeating row 0 to keep shapes static
            images[B:] = images[0]
            captions[B:] = captions[0]
        return {"image": images, "caption": captions, "length": lengths,
                "valid": valid}

    @staticmethod
    def _stack_images(imgs, target: int, H: int, W: int) -> np.ndarray:
        """(B) list of (H, W) uint8 -> (target, H, W, 1); C++ thread-pool
        scatter when the native library is built."""
        out = np.zeros((target, H, W, 1), np.uint8)
        try:
            from ..native import assemble_batch, available

            if available() and imgs:
                out[:len(imgs)] = assemble_batch(imgs)
                return out
        except Exception:
            pass
        for j, img in enumerate(imgs):
            out[j, :, :, 0] = img
        return out

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if hasattr(self.dataset, "set_epoch"):  # streaming datasets
            self.dataset.set_epoch(self._epoch)
        batches = self._batch_indices()
        self._epoch += 1
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with cf.ThreadPoolExecutor(self.num_workers) as pool:
                for idxs in batches:
                    if stop.is_set():
                        return
                    item = self._assemble(pool, idxs)
                    # bounded put that notices consumer abandonment, so an
                    # early-exiting consumer does not leak a blocked thread
                    while True:
                        if stop.is_set():
                            return
                        try:
                            q.put(item, timeout=0.5)
                            break
                        except queue.Full:
                            continue
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()


def get_data_loaders(tokenizer: Tokenizer, data_cfg: DataConfig,
                     model_cfg: ModelConfig):
    """(train, val) loaders (reference: src/data_loader.py:49-76).
    Augmentation is NOT applied here — it runs on device; see
    data/augment.py and the train pipeline."""
    mk = lambda split, shuffle: DataLoader(
        MathFormulaDataset(data_cfg.img_dir(split),
                           data_cfg.label_path(split), tokenizer,
                           model_cfg.img_h, model_cfg.img_w,
                           model_cfg.max_seq_len),
        data_cfg.batch_size, shuffle=shuffle, seed=data_cfg.shuffle_seed,
        num_workers=data_cfg.num_workers, drop_remainder=shuffle)
    return mk("train", True), mk("validate", False)


def get_test_loader(tokenizer: Tokenizer, data_cfg: DataConfig,
                    model_cfg: ModelConfig) -> DataLoader:
    """Test loader (reference: src/data_loader.py:79-94)."""
    return DataLoader(
        MathFormulaDataset(data_cfg.img_dir("test"),
                           data_cfg.label_path("test"), tokenizer,
                           model_cfg.img_h, model_cfg.img_w,
                           model_cfg.max_seq_len),
        data_cfg.batch_size, shuffle=False,
        num_workers=data_cfg.num_workers)
