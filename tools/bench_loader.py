#!/usr/bin/env python
"""Host input-pipeline benchmark (VERDICT r3 item 4).

Measures the DetectionLoader end-to-end (JPEG decode -> shortest-side-800
resize -> flip -> BGRx255 normalize -> bucket-pad -> fixed-shape batch
assembly) on THIS host at COCO-like image sizes, plus a per-stage
single-image cost breakdown. The reference leans on torch
DataLoader(num_workers) for the same work
(paa_core/data/build.py:107-177); our loader uses a cv2 thread pool
(cv2 releases the GIL) + batch prefetch.

Synthesizes an on-disk JPEG dataset once (cached under /tmp), then:
  - per-stage: imdecode, resize, hflip, normalize, batch-assemble
  - end-to-end loader img/s for --threads (default 1,2,4,8), train+eval

Prints a PERF.md-ready table and a final JSON line. Compare against the
chip rates (bench.py: ~266 img/s eval, ~100 img/s train at B=32) to
size the host core count a production run needs.

Usage: python tools/bench_loader.py [--images 64] [--batches 12]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# typical COCO val2014 sizes (w, h): most are 640-capped
COCO_SIZES = [(640, 480), (640, 427), (500, 375), (640, 426),
              (481, 640), (640, 478), (612, 612), (640, 425)]


def synth_dataset(root, n_images, seed=0):
    """JPEG images with natural-ish low-frequency content (random noise
    JPEGs are atypically slow to decode) + a COCO annotation json."""
    import cv2

    os.makedirs(root, exist_ok=True)
    ann_path = os.path.join(root, f"instances_{n_images}.json")
    img_dir = os.path.join(root, "images")
    if os.path.exists(ann_path):
        return ann_path, img_dir
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    images, annotations = [], []
    ann_id = 1
    for i in range(n_images):
        w, h = COCO_SIZES[i % len(COCO_SIZES)]
        low = rng.randint(0, 255, (h // 16, w // 16, 3), dtype=np.uint8)
        img = cv2.resize(low, (w, h), interpolation=cv2.INTER_CUBIC)
        img = np.clip(
            img.astype(np.int16) + rng.randint(-8, 8, img.shape), 0, 255
        ).astype(np.uint8)
        name = f"img{i:05d}.jpg"
        cv2.imwrite(os.path.join(img_dir, name), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 90])
        images.append(dict(id=i + 1, file_name=name, width=w, height=h))
        for _ in range(rng.randint(1, 8)):
            x = float(rng.uniform(0, w - 40))
            y = float(rng.uniform(0, h - 40))
            bw = float(rng.uniform(20, w - x))
            bh = float(rng.uniform(20, h - y))
            annotations.append(dict(
                id=ann_id, image_id=i + 1, bbox=[x, y, bw, bh],
                area=bw * bh, category_id=int(rng.randint(1, 81)),
                iscrowd=0,
            ))
            ann_id += 1
    categories = [dict(id=c, name=f"c{c}") for c in range(1, 81)]
    with open(ann_path, "w") as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=categories), f)
    return ann_path, img_dir


def bench_stages(dataset, reps=24):
    """Single-threaded per-stage cost, averaged over the dataset head."""
    import cv2

    from paa_tpu.data.loader import make_batch
    from paa_tpu.data.transforms import (
        hflip_image_and_boxes,
        normalize_image,
        resize_image_and_boxes,
    )

    paths = [
        os.path.join(dataset.root, dataset.records[i].file_name)
        for i in range(min(reps, len(dataset)))
    ]
    raw = [open(p, "rb").read() for p in paths]

    t0 = time.perf_counter()
    decoded = [
        cv2.imdecode(np.frombuffer(b, np.uint8), cv2.IMREAD_COLOR)
        for b in raw
    ]
    t_decode = (time.perf_counter() - t0) / len(raw)

    boxes = np.asarray([[10.0, 10.0, 100.0, 100.0]] * 4, np.float32)
    t0 = time.perf_counter()
    resized = [
        resize_image_and_boxes(im, boxes, 800, 1333)[0] for im in decoded
    ]
    t_resize = (time.perf_counter() - t0) / len(raw)

    t0 = time.perf_counter()
    flipped = [hflip_image_and_boxes(im, boxes)[0] for im in resized]
    t_flip = (time.perf_counter() - t0) / len(raw)

    mean, std = [102.9801, 115.9465, 122.7717], [1.0, 1.0, 1.0]
    t0 = time.perf_counter()
    normed = [normalize_image(im, mean, std) for im in flipped]
    t_norm = (time.perf_counter() - t0) / len(raw)

    def batch_all(imgs, normalize):
        samples = [
            dict(image=im, boxes=boxes, labels=np.ones((4,), np.int64),
                 image_id=1, orig_size=im.shape[:2])
            for im in imgs
        ]
        land = [s for s in samples
                if s["image"].shape[1] >= s["image"].shape[0]]
        port = [s for s in samples
                if s["image"].shape[1] < s["image"].shape[0]]
        t0 = time.perf_counter()
        n = 0
        for group, bucket in ((land, (800, 1344)), (port, (1344, 800))):
            for i in range(0, len(group) - 7, 8):
                make_batch(group[i:i + 8], bucket, 100,
                           normalize=normalize)
                n += 8
        return (time.perf_counter() - t0) / max(n, 1)

    # legacy: pad pre-normalized f32 samples (copy only)
    t_pad = batch_all(normed, None)
    # shipped path: fused (uint8 - mean) straight into the batch buffer
    t_fused = batch_all(flipped, (mean, std))

    return dict(decode_ms=t_decode * 1e3, resize_ms=t_resize * 1e3,
                flip_ms=t_flip * 1e3, normalize_ms=t_norm * 1e3,
                pad_assemble_ms=t_pad * 1e3,
                fused_norm_pad_ms=t_fused * 1e3)


def bench_loader(cfg, dataset, is_train, threads, n_batches):
    from paa_tpu.data.loader import make_data_loader

    cfg = cfg.clone()
    cfg.defrost()
    cfg.DATALOADER.NUM_WORKERS = threads
    loader = make_data_loader(cfg, dataset, is_train=is_train)
    it = iter(loader)
    next(it)  # warmup: thread pool spin-up + first prefetch
    t0 = time.perf_counter()
    done = 0
    bsz = cfg.SOLVER.IMS_PER_BATCH if is_train else cfg.TEST.IMS_PER_BATCH
    while done < n_batches:
        try:
            next(it)
            done += 1
        except StopIteration:
            # eval loaders are single-epoch; restart to fill the window
            it = iter(loader)
    dt = time.perf_counter() - t0
    imgs = done * bsz
    return imgs / dt if dt > 0 else float("inf")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--batches", type=int, default=12)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--threads", default="1,2,4,8")
    ap.add_argument("--root", default="/tmp/paa_tpu_loader_bench")
    args = ap.parse_args()

    from paa_tpu.config import get_cfg
    from paa_tpu.data.coco import COCODataset

    ann, img_dir = synth_dataset(args.root, args.images)
    dataset = COCODataset(ann, img_dir,
                          remove_images_without_annotations=False)

    cfg = get_cfg()
    cfg.merge_from_file("configs/paa/paa_R_50_FPN_1x.yaml")
    cfg.SOLVER.IMS_PER_BATCH = args.batch_size
    cfg.TEST.IMS_PER_BATCH = args.batch_size
    cfg.SOLVER.MAX_ITER = 10 ** 9

    stages = bench_stages(dataset)
    # shipped pipeline: decode -> resize -> flip -> fused norm+pad
    # (normalize_ms/pad_assemble_ms show the pre-fusion path for
    # comparison and are NOT part of the shipped total)
    per_img_ms = (stages["decode_ms"] + stages["resize_ms"]
                  + stages["flip_ms"] + stages["fused_norm_pad_ms"])
    print("per-stage single-thread cost (ms/img, 800x1333 target):")
    for k, v in stages.items():
        print(f"  {k:>18}: {v:7.2f}")
    print(f"  {'TOTAL (shipped)':>18}: {per_img_ms:7.2f}  "
          f"(= {1e3 / per_img_ms:.1f} img/s/core)")

    results = {"stages_ms": stages, "per_img_ms": per_img_ms,
               "img_per_s_per_core": 1e3 / per_img_ms, "loader": {}}
    for t in [int(x) for x in args.threads.split(",")]:
        tr = bench_loader(cfg, dataset, True, t, args.batches)
        ev = bench_loader(cfg, dataset, False, t, args.batches)
        results["loader"][t] = dict(train=tr, eval=ev)
        print(f"loader threads={t:2d}: train {tr:7.1f} img/s | "
              f"eval {ev:7.1f} img/s")

    ncores = os.cpu_count()
    chip_eval, chip_train = 266.0, 100.6
    need_eval = chip_eval / results["img_per_s_per_core"]
    need_train = chip_train / results["img_per_s_per_core"]
    print(f"host cores: {ncores}; cores needed to sustain chip rate: "
          f"eval ~{need_eval:.1f}, train ~{need_train:.1f}")
    results.update(host_cores=ncores, cores_for_eval=need_eval,
                   cores_for_train=need_train)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
