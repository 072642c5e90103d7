from radio_mapper_tpu.cli import main

main()
