#!/usr/bin/env python3
"""Sky data tool: bake + inspect the atmosphere maps.

Counterpart of the reference's offline sky-data generator
(reference: tool/SkyData/skyData.cpp — extracts the dataset slice that
feeds the sky model).  Our sky is analytic, so the tool's job inverts:
bake the radiance/pdf maps for a given sun position and dump them as PNGs
(tonemapped) for inspection, plus a sun-elevation sweep strip.

Usage: python tools/sky_preview.py out_dir [--elevation 0.5] [--sweep N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def tonemap_u8(img, ev=1.0):
    x = np.asarray(img) * ev
    x = x / (1.0 + x)
    return (np.clip(x, 0, 1) ** (1 / 2.2) * 255).astype(np.uint8)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("out_dir")
    p.add_argument("--elevation", type=float, default=0.5)
    p.add_argument("--azimuth", type=float, default=0.2)
    p.add_argument("--sweep", type=int, default=0,
                   help="render N sun elevations into a strip")
    args = p.parse_args()

    import jax
    from rtrt_tpu.render.sky import bake_sky_maps, make_sky_params
    from rtrt_tpu.utils.image import write_png

    os.makedirs(args.out_dir, exist_ok=True)
    bake = jax.jit(lambda prm: bake_sky_maps(prm))

    maps = bake(make_sky_params(sun_elevation=args.elevation,
                                sun_azimuth=args.azimuth))
    write_png(os.path.join(args.out_dir, "sky_map.png"),
              tonemap_u8(maps.sky_map, 2.0))
    write_png(os.path.join(args.out_dir, "sun_map.png"),
              tonemap_u8(maps.sun_map, 0.05))
    pdf = np.asarray(maps.sky_pdf).reshape(maps.sky_map.shape[:2])
    pdf_img = (pdf / max(pdf.max(), 1e-9)) ** 0.25
    write_png(os.path.join(args.out_dir, "sky_pdf.png"), pdf_img)
    print(f"wrote sky_map/sun_map/sky_pdf to {args.out_dir} "
          f"(flux sky={float(maps.sky_flux):.3f} sun={float(maps.sun_flux):.3f})")

    if args.sweep:
        strips = []
        for k in range(args.sweep):
            elev = -0.1 + 1.2 * k / max(args.sweep - 1, 1)
            m = bake(make_sky_params(sun_elevation=elev))
            strips.append(tonemap_u8(m.sky_map, 2.0))
        write_png(os.path.join(args.out_dir, "sweep.png"),
                  np.concatenate(strips, axis=0))
        print(f"wrote sweep.png ({args.sweep} elevations)")


if __name__ == "__main__":
    main()
