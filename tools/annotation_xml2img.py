#!/usr/bin/env python
"""Rasterize CVAT-style XML polygon annotations to uint8 label PNGs
(reference: tools/annotation_xml2img.py).

The XML layout expected:

    <annotations>
      <meta><task><labels>
        <label><name>car</name>
               <attributes><attribute>...id:13</attribute></attributes>
        </label> ...
      </labels></task></meta>
      <image name="frame0.png" width="W" height="H">
        <polygon label="car" points="x0,y0;x1,y1;..."/>
      </image>
    </annotations>

Each label's trailing ``id:<n>`` attribute value gives the raster value;
the ``void`` label fills the background. Output:
``{output}/{image_stem}_GT.png``.
"""

import argparse
import glob
import os
import xml.etree.ElementTree as ET

import numpy as np


def parse_label_entry(label):
    entry = {}
    for node in label:
        if node.tag == "name":
            entry["name"] = node.text
        elif node.tag == "attributes":
            for attr in node:
                text = attr.text if attr.text else ""
                for sub in attr:
                    if sub.text:
                        text = sub.text
                if ":" in text:
                    tag, value = text.split("=")[-1].split(":", 1)
                    entry[tag] = value
    return entry


def extract_label_map(root):
    labels = None
    meta = root.find("meta")
    if meta is not None:
        task = meta.find("task")
        if task is not None:
            labels = task.find("labels")
    if labels is None:
        raise ValueError("Could not find labels entry")
    cmap = {}
    for label in labels:
        attrs = parse_label_entry(label)
        if "name" in attrs and "id" in attrs:
            cmap[attrs["name"]] = int(attrs["id"])
    return cmap


def fill_polygon(canvas, pts, value):
    try:
        import cv2
        cv2.fillPoly(canvas, [pts.astype(np.int32)], color=int(value))
    except ImportError:  # PIL fallback
        from PIL import Image, ImageDraw
        img = Image.fromarray(canvas)
        ImageDraw.Draw(img).polygon(
            [tuple(p) for p in pts.tolist()], fill=int(value))
        canvas[:] = np.asarray(img)
    return canvas


def rasterize_file(path, output_dir="."):
    tree = ET.ElementTree(file=path)
    root = tree.getroot()
    cmap = extract_label_map(root)
    background = cmap.get("void", 255)
    written = []
    for node in root:
        if node.tag != "image":
            continue
        width = int(float(node.attrib["width"]))
        height = int(float(node.attrib["height"]))
        name = os.path.basename(node.attrib["name"]).split(".")[0]
        annotation = np.full((height, width), background, dtype=np.uint8)
        for polygon in node:
            if polygon.tag != "polygon":
                continue
            pts_str = [pt.split(",")
                       for pt in polygon.attrib["points"].split(";")]
            pts = np.round(np.array(pts_str, np.float32)).astype(np.int32)
            annotation = fill_polygon(annotation, pts,
                                      cmap[polygon.attrib["label"]])
        out_path = os.path.join(output_dir, name + "_GT.png")
        from PIL import Image
        Image.fromarray(annotation).save(out_path)
        written.append(out_path)
        print("written: %s" % out_path)
    return written


def main(args):
    output = args.output or "."
    os.makedirs(output, exist_ok=True)
    for filepattern in args.paths:
        if not filepattern.endswith(".xml"):
            continue
        for path in glob.glob(filepattern):
            print(path)
            rasterize_file(path, output)
    return 0


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("-o", dest="output", type=str, default=".",
                        help="Output directory")
    parser.add_argument(nargs=argparse.REMAINDER, dest="paths", type=str,
                        help="Glob paths to xml with polygons")
    main(parser.parse_args())
