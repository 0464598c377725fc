"""Post-processing tools: format converters and plotting (reference
driver/examples/zarr_to_nc.py and plot_output/plot_cube scripts)."""
