"""Regenerate engine.zip (the spark-submit --py-files artifact)."""
import os
import zipfile

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
out = os.path.join(repo, "engine.zip")
with zipfile.ZipFile(out, "w") as z:
    for root, _dirs, files in os.walk(
            os.path.join(repo, "search_engine_skillbox_spark")):
        for f in sorted(files):
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, os.path.relpath(p, repo))
print(f"wrote {out}")
