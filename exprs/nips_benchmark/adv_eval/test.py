import sys

from robustart_tpu.tools.inspect_ckpt import main

main(sys.argv[1:])
