#!/bin/sh
# Package the library for spark-submit --py-files (north_rule invocation
# mode): executors import rio_cogeo_spark from this zip, no install step.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/rio_cogeo_spark.zip
python -c "
import zipfile, pathlib
root = pathlib.Path('rio_cogeo_spark')
with zipfile.ZipFile('dist/rio_cogeo_spark.zip', 'w') as z:
    for p in sorted(root.rglob('*.py')):
        z.write(p, p.as_posix())
print('wrote dist/rio_cogeo_spark.zip')
"
