"""Host data pipeline: decode → augment → batch → prefetch to device.

Replaces the reference's 32-worker torch DataLoader + host-side target
encoding (dataset/_helper.py:155-181). The host does only decode + geometric
augmentation; YOLO target encoding happens ON DEVICE inside the jitted step
(ops/targets.py), and batches are double-buffered onto the device by a
background prefetch thread.

Augmentation parity (distributional, per SURVEY §7 hard-part 4):
  train: Resize(S,S) + Affine(scale 0.8–1.2, translate ±10%, rotate ±30°,
         shear ±15°) + /255   (reference dataset/AntiUAVDataset.py:56-68)
  val:   Resize(S,S) + /255   (reference prepare_dataloader.py:20-24)

Boxes ride the affine as corner-transformed AABBs (albumentations'
pascal_voc convention). Samples whose box degenerates are dropped, matching
the reference collate's drop-empty behavior (dataset/_helper.py:131-152).
"""

import queue
import threading
from typing import Iterator, List, Optional

import numpy as np

from ..utils.datatypes import BatchData
from .mosaic import create_mosaic_4_img, mosaic_layout


def _load_image(path: str, fs=None) -> np.ndarray:
    if fs is not None:
        return fs.load_image(path)
    from PIL import Image
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def _image_hw(path: str):
    """Image (height, width) from the header only (no pixel decode)."""
    from PIL import Image
    with Image.open(path) as im:
        return im.height, im.width


def _affine_matrix(rng: np.random.Generator, size: int) -> np.ndarray:
    """Random affine about the image center, albumentations-Affine-style."""
    scale = rng.uniform(0.8, 1.2)
    tx = rng.uniform(-0.1, 0.1) * size
    ty = rng.uniform(-0.1, 0.1) * size
    theta = np.deg2rad(rng.uniform(-30, 30))
    shear_x = np.deg2rad(rng.uniform(-15, 15))
    shear_y = np.deg2rad(rng.uniform(-15, 15))

    c, s = np.cos(theta), np.sin(theta)
    rot = np.array([[c, -s], [s, c]])
    shear = np.array([[1, np.tan(shear_x)], [np.tan(shear_y), 1]])
    lin = scale * (rot @ shear)

    center = size / 2
    offset = np.array([center + tx, center + ty]) - lin @ np.array(
        [center, center])
    return np.concatenate([lin, offset[:, None]], axis=1)  # (2, 3)


def _affine_boxes(boxes: np.ndarray, mat: np.ndarray,
                  size: int) -> np.ndarray:
    """Corner-transform AABBs under the affine (pixel-free box path)."""
    if len(boxes):
        corners = np.stack([
            boxes[:, [0, 1]], boxes[:, [2, 1]],
            boxes[:, [0, 3]], boxes[:, [2, 3]]], axis=1)  # (N, 4, 2)
        t = corners @ mat[:, :2].T + mat[:, 2]
        boxes = np.concatenate([t.min(axis=1), t.max(axis=1)], axis=-1)
        boxes = boxes.clip(0, size - 1e-3)
    return boxes


def _apply_affine(img: np.ndarray, boxes: np.ndarray,
                  mat: np.ndarray) -> tuple:
    import cv2
    size = img.shape[0]
    out = cv2.warpAffine(img, mat, (size, size),
                         flags=cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    return out, _affine_boxes(boxes, mat, size)


def _resize(img: np.ndarray, boxes: np.ndarray, size: int) -> tuple:
    import cv2
    h, w = img.shape[:2]
    out = cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)
    if len(boxes):
        boxes = boxes * np.array([size / w, size / h, size / w, size / h])
    return out, boxes


def make_transform(input_size: int, train: bool):
    """Build the per-sample (image, boxes, rng) → (image, boxes) transform."""

    def tf(img, boxes, rng):
        img, boxes = _resize(img, boxes, input_size)
        if train:
            mat = _affine_matrix(rng, input_size)
            img, boxes = _apply_affine(img, boxes, mat)
            # drop boxes that degenerate under the affine
            if len(boxes):
                keep = ((boxes[:, 2] - boxes[:, 0]) > 1.0) & (
                    (boxes[:, 3] - boxes[:, 1]) > 1.0)
                boxes = boxes[keep]
        return img.astype(np.float32) / 255.0, boxes.astype(np.float32)

    return tf


class DataPipeline:
    """Epoch iterator over a manifest producing device-ready BatchData.

    Matches the yolo-collate semantics: samples whose augmented box list is
    empty are dropped from the batch (reference dataset/_helper.py:131-152);
    box arrays are padded to ``max_boxes`` with a validity mask.
    """

    def __init__(self, records: List[dict], input_size: int, batch_size: int,
                 train: bool, seed: int = 11, max_boxes: int = 8,
                 mosaic: bool = False, shuffle: Optional[bool] = None,
                 drop_last: bool = True, fs=None, prefetch: int = 2,
                 workers: int = 1, fmt: str = "yolo"):
        """``workers`` (reference ``dataset.workers``,
        dataset/_helper.py:176): >1 decodes samples in parallel — plain
        local JPEGs go through the native C++ thread-pool batch decoder
        (native/uavloader.cc::uav_decode_resize_batch), everything else
        through a thread pool over the python path. Augmentation RNG is
        then per-sample (seeded from (seed, epoch, position)) — same
        distribution as the sequential stream, different draws, exactly
        like torch's worker processes.

        ``fmt`` (reference ``dataset.format``, dataset/_helper.py:178):
        'yolo' keeps per-sample variable box lists (padded+masked);
        'custom' mirrors _custom_collate_fn's stacked-tensor contract —
        exactly one box per sample, stacked (B, 1, 4)."""
        self.records = records
        self.input_size = input_size
        self.batch_size = batch_size
        self.train = train
        self.mosaic = mosaic
        self.max_boxes = max_boxes
        self.shuffle = train if shuffle is None else shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.fs = fs
        # remote filesystems (one paramiko SFTP channel / fsspec instance)
        # are NOT safe for concurrent reads — serialize them even when
        # workers > 1 (decode/augment still parallelize)
        self._fs_lock = threading.Lock()
        self.prefetch = prefetch
        self.workers = max(1, int(workers))
        if fmt not in ("yolo", "custom"):
            raise ValueError(f"unknown dataset format: {fmt!r}")
        self.fmt = fmt
        self.transform = make_transform(input_size, train)
        self._epoch = 0
        # multi-host sharded decode (set_local_rows): batch rows whose
        # pixels this process must materialize; None → decode everything
        self.local_rows = None
        # multi-host consumers re-shard batches globally themselves — let
        # them opt out of the single-device prefetch put
        self.device_prefetch = True

    def set_local_rows(self, rows) -> bool:
        """Restrict pixel decode to the given batch-row indices (multi-host:
        parallel.multihost.local_batch_rows — the rows whose image shards
        live on this process's devices). Batch MEMBERSHIP stays globally
        identical: the drop-empty decision depends only on box geometry,
        which ``_batches_sharded`` computes for every sample from manifest
        records + header-only image sizes, without decoding pixels. Rows
        outside the set are zero-filled; ``shard_host_batch`` never reads
        them (make_array_from_callback materializes only addressable
        shards).

        Mosaic-train membership is replayed geometry-only too: the
        quadrant placement + degenerate-skip plan needs only header sizes
        and manifest boxes (``data.mosaic.mosaic_layout``), so only the
        source-image pixel decodes are skipped for non-owned rows.

        Returns False (and decodes everything) only for remote (``fs``)
        loaders, whose image headers cannot be read without fetching the
        object anyway."""
        if self.fs is not None:
            self.local_rows = None
            return False
        self.local_rows = frozenset(int(r) for r in rows)
        return True

    def __len__(self):
        n = len(self.records) // self.batch_size
        if not self.drop_last and len(self.records) % self.batch_size:
            n += 1
        return n

    def _post_resize(self, img: np.ndarray, boxes: np.ndarray,
                     w0: int, h0: int, rng) -> tuple:
        """Box rescale (+train affine +degenerate drop) for an image the
        decoder already resized to (input_size, input_size)."""
        s = self.input_size
        boxes = boxes * np.asarray([s / w0, s / h0, s / w0, s / h0],
                                   np.float32)
        if self.train:
            mat = _affine_matrix(rng, s)
            img, boxes = _apply_affine(img, boxes, mat)
            if len(boxes):
                keep = ((boxes[:, 2] - boxes[:, 0]) > 1.0) & (
                    (boxes[:, 3] - boxes[:, 1]) > 1.0)
                boxes = boxes[keep]
        return img, boxes.astype(np.float32)

    def _sample(self, rec: dict, rng: np.random.Generator):
        if self.mosaic and self.train:
            idx = rng.integers(0, len(self.records), size=4)
            imgs = [self._read_image(self.records[i]["img_path"])
                    for i in idx]
            bxs = [np.asarray(self.records[i]["bbox"], np.float32)
                   for i in idx]
            img, boxes = create_mosaic_4_img(
                imgs, bxs, (self.input_size, self.input_size))
            return self.transform(img, boxes, rng)

        boxes = np.asarray([rec["bbox"]], np.float32)
        path = rec["img_path"]
        if self.fs is None and path.endswith(".jpg"):
            # native C++ decode+resize+normalize fast path
            # (native/uavloader.cc)
            from .native import get_lib
            lib = get_lib()
            if lib is not None:
                import ctypes
                img = np.empty(
                    (self.input_size, self.input_size, 3), np.float32)
                if lib.uav_decode_resize(
                        path.encode(), self.input_size,
                        img.ctypes.data_as(
                            ctypes.POINTER(ctypes.c_float))):
                    h0, w0 = _image_hw(path)
                    return self._post_resize(img, boxes, w0, h0, rng)

        img = self._read_image(path)
        return self.transform(img, boxes, rng)

    def _read_image(self, path: str) -> np.ndarray:
        if self.fs is not None:
            with self._fs_lock:
                return self.fs.load_image(path)
        return _load_image(path)

    def _produce_samples(self, order, rng) -> Iterator[tuple]:
        """Yield (img, boxes) per manifest position, in order.

        workers == 1: the sequential path (single shared RNG stream).
        workers > 1: chunks are decoded in parallel — local JPEGs through
        the native thread-pool batch decoder, the rest via a thread pool —
        with a per-sample RNG derived from (seed, epoch, position)."""
        if self.workers == 1:
            for i in order:
                yield self._sample(self.records[i], rng)
            return

        from concurrent.futures import ThreadPoolExecutor
        from .native import decode_resize_batch, native_available

        rngs = [np.random.default_rng(s) for s in np.random.SeedSequence(
            [self.seed, self._epoch]).spawn(len(order))]
        chunk = max(self.batch_size * 4, self.workers * 4)
        use_native = (not (self.mosaic and self.train) and self.fs is None
                      and native_available())
        with ThreadPoolExecutor(self.workers) as ex:
            for c0 in range(0, len(order), chunk):
                idxs = order[c0:c0 + chunk]
                recs = [self.records[i] for i in idxs]
                results: List = [None] * len(recs)
                npos = [j for j, r in enumerate(recs) if use_native
                        and r["img_path"].endswith(".jpg")]
                if npos:
                    paths = [recs[j]["img_path"] for j in npos]
                    imgs, ok = decode_resize_batch(
                        paths, self.input_size, threads=self.workers)
                    hw = list(ex.map(_image_hw, paths))
                    for k, j in enumerate(npos):
                        if ok[k]:
                            results[j] = self._post_resize(
                                imgs[k],
                                np.asarray([recs[j]["bbox"]], np.float32),
                                hw[k][1], hw[k][0], rngs[c0 + j])
                rest = [j for j in range(len(recs)) if results[j] is None]
                for j, res in zip(rest, ex.map(
                        lambda j: self._sample(recs[j], rngs[c0 + j]),
                        rest)):
                    results[j] = res
                yield from results

    def _batches_sharded(self) -> Iterator[BatchData]:
        """Multi-host epoch iterator (``local_rows`` set): phase 1 replays
        the full global stream GEOMETRY-ONLY — box scaling from header
        sizes, affine draws from the same RNG convention as the normal
        path (shared stream for workers==1, per-position seeds for
        workers>1), drop-empty membership — so every host agrees on batch
        composition bitwise; phase 2 decodes pixels only for the rows this
        host's devices hold."""
        from .native import decode_resize_batch, native_available
        rng = np.random.default_rng(self.seed + self._epoch)
        order = (rng.permutation(len(self.records)) if self.shuffle
                 else np.arange(len(self.records)))
        s = self.input_size
        native_ok = native_available()
        rngs = None
        if self.workers > 1:
            rngs = [np.random.default_rng(sd)
                    for sd in np.random.SeedSequence(
                        [self.seed, self._epoch]).spawn(len(order))]

        kept: List[tuple] = []  # (record, use_native, mat, boxes)
        for pos, i in enumerate(order):
            rec = self.records[i]
            srng = rngs[pos] if rngs is not None else rng
            if self.mosaic and self.train:
                # mosaic replay: SAME rng draw order as _sample (source
                # indices, then the affine), placement plan from header
                # sizes only (data.mosaic.mosaic_layout)
                idx = srng.integers(0, len(self.records), size=4)
                sizes = [_image_hw(self.records[j]["img_path"])
                         for j in idx]
                bxs = [np.asarray(self.records[j]["bbox"], np.float32)
                       for j in idx]
                layout = mosaic_layout(sizes, bxs, (s, s))
                boxes = np.asarray([b for _, _, b in layout], np.float32)
                # transform replay: _resize of the (s, s) mosaic scales
                # boxes by exactly 1.0 in float64 — astype is bitwise-equal
                boxes = boxes.astype(np.float64).reshape(-1, 4)
                mat = _affine_matrix(srng, s)
                boxes = _affine_boxes(boxes, mat, s)
                keep_m = ((boxes[:, 2] - boxes[:, 0]) > 1.0) & (
                    (boxes[:, 3] - boxes[:, 1]) > 1.0)
                boxes = boxes[keep_m].astype(np.float32)
                if len(boxes) == 0:
                    continue  # drop-empty: same decision on every host
                kept.append(({"mosaic_idx": idx}, False, mat, boxes))
                if len(kept) == self.batch_size:
                    yield self._materialize_rows(kept, decode_resize_batch)
                    kept = []
                continue
            use_native = native_ok and rec["img_path"].endswith(".jpg")
            h0, w0 = _image_hw(rec["img_path"])
            boxes = np.asarray([rec["bbox"]], np.float32)
            if use_native:  # _post_resize scales boxes in float32
                boxes = boxes * np.asarray(
                    [s / w0, s / h0, s / w0, s / h0], np.float32)
            else:  # _resize scales in float64
                boxes = boxes * np.array([s / w0, s / h0, s / w0, s / h0])
            mat = None
            if self.train:
                mat = _affine_matrix(srng, s)
                boxes = _affine_boxes(boxes, mat, s)
                keep_m = ((boxes[:, 2] - boxes[:, 0]) > 1.0) & (
                    (boxes[:, 3] - boxes[:, 1]) > 1.0)
                boxes = boxes[keep_m]
            boxes = boxes.astype(np.float32)
            if len(boxes) == 0:
                continue  # drop-empty: same decision on every host
            kept.append((rec, use_native, mat, boxes))
            if len(kept) == self.batch_size:
                yield self._materialize_rows(kept, decode_resize_batch)
                kept = []
        if kept and not self.drop_last:
            yield self._materialize_rows(kept, decode_resize_batch)
        self._epoch += 1

    def _materialize_rows(self, kept, decode_resize_batch) -> BatchData:
        """Phase 2 of the sharded iterator: decode pixels for the owned
        rows only (native batch decoder for plain JPEGs, python path
        otherwise), applying the phase-1 affine. Non-owned rows stay
        zero — the global array constructor never reads them."""
        s = self.input_size
        b = len(kept)
        images = np.zeros((b, s, s, 3), np.float32)
        rows = [r for r in range(b)
                if self.local_rows is None or r in self.local_rows]
        npos = [r for r in rows if kept[r][1]]
        if npos:
            paths = [kept[r][0]["img_path"] for r in npos]
            imgs, ok = decode_resize_batch(paths, s, threads=self.workers)
            for k, r in enumerate(npos):
                mat = kept[r][2]
                if ok[k]:
                    img = imgs[k]
                    if mat is not None:
                        img, _ = _apply_affine(img, np.zeros((0, 4)), mat)
                else:  # corrupt file: python decode (boxes keep the
                    # phase-1 float32 scaling — documented deviation)
                    img, _ = _resize(_load_image(paths[k]),
                                     np.zeros((0, 4)), s)
                    if mat is not None:
                        img, _ = _apply_affine(img, np.zeros((0, 4)), mat)
                    img = img.astype(np.float32) / 255.0
                images[r] = img
        for r in rows:
            if kept[r][1]:
                continue
            rec, _, mat, _ = kept[r]
            if "mosaic_idx" in rec:
                srcs = [self._read_image(
                    self.records[j]["img_path"]) for j in rec["mosaic_idx"]]
                bxs = [np.asarray(self.records[j]["bbox"], np.float32)
                       for j in rec["mosaic_idx"]]
                img, _ = create_mosaic_4_img(srcs, bxs, (s, s))
            else:
                img = self._read_image(rec["img_path"])
            img, _ = _resize(img, np.zeros((0, 4)), s)
            if mat is not None:
                img, _ = _apply_affine(img, np.zeros((0, 4)), mat)
            images[r] = img.astype(np.float32) / 255.0
        return self._collate(list(images), [k[3] for k in kept])

    def _batches(self) -> Iterator[BatchData]:
        if self.local_rows is not None:
            yield from self._batches_sharded()
            return
        rng = np.random.default_rng(self.seed + self._epoch)
        order = (rng.permutation(len(self.records)) if self.shuffle
                 else np.arange(len(self.records)))

        images, boxes_list = [], []
        for img, boxes in self._produce_samples(order, rng):
            if len(boxes) == 0:
                continue  # drop-empty (collate parity, both reference fns)
            images.append(img)
            boxes_list.append(boxes)
            if len(images) == self.batch_size:
                yield self._collate(images, boxes_list)
                images, boxes_list = [], []
        if images and not self.drop_last:
            yield self._collate(images, boxes_list)
        self._epoch += 1

    def _collate(self, images, boxes_list) -> BatchData:
        b = len(images)
        if self.fmt == "custom":
            # _custom_collate_fn contract (reference _helper.py:113-129):
            # torch.stack over per-sample box tensors — requires equal
            # box counts per sample
            counts = {len(bx) for bx in boxes_list}
            if len(counts) > 1:
                raise ValueError(
                    "format='custom' stacks box tensors; got unequal "
                    f"per-sample box counts {sorted(counts)}")
        boxes = np.zeros((b, self.max_boxes, 4), np.float32)
        mask = np.zeros((b, self.max_boxes), bool)
        for i, bx in enumerate(boxes_list):
            n = min(len(bx), self.max_boxes)
            boxes[i, :n] = bx[:n] / self.input_size  # normalized xyxy
            mask[i, :n] = True
        return BatchData(image=np.stack(images), boxes=boxes, box_mask=mask)

    def __iter__(self) -> Iterator[BatchData]:
        """Iterate batches, prefetching to device on a background thread."""
        import jax

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        _END = object()

        def producer():
            try:
                for batch in self._batches():
                    q.put(jax.tree.map(jax.device_put, batch)
                          if self.device_prefetch else batch)
            finally:
                q.put(_END)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _END:
                break
            yield item
