import sys

from robustart_tpu.tools.parse_transfer import main

main(sys.argv[1:])
