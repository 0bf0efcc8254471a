"""spark-submit launcher (plain script, no relative imports):

    python tools/package_zip.py
    spark-submit --master <cluster> --py-files vlm_ocr_doc_reader_spark.zip \
        tools/submit_extract.py extract --input ... --output ... --state ...

Forwards argv to the package CLI (extract/describe/scan/resolve/verify).
"""

import sys

from vlm_ocr_doc_reader_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
