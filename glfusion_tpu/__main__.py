from glfusion_tpu.cli import main

raise SystemExit(main())
