/* Minimal libjpeg(-turbo) shim for the dd_ops_ocr_spark codec-injection
 * seam (operators/multimodal.py: media_metadata(decoder=...)).
 *
 * The reference renders document pages as q95 JPEGs
 * (src/modules/step1/03_image_converter.py:42-57); at 100 TB of page
 * images the decode is the dominant per-byte cost, so production
 * deployments inject a native codec here while the pure-numpy
 * operators/jpeg.py remains the dependency-free fallback and the
 * correctness oracle.
 *
 * API kept deliberately tiny and ctypes-friendly: flat buffers in/out,
 * int return codes, no structs crossing the FFI boundary. Errors inside
 * libjpeg longjmp back here and surface as negative codes — a corrupt
 * payload must never abort the executor (libjpeg's default error_exit
 * calls exit()).
 *
 * Build (native/__init__.py does this on demand):
 *   gcc -O2 -shared -fPIC -o _jpegshim.so jpegshim.c -ljpeg
 */
#include <setjmp.h>
#include <stddef.h>
#include <stdlib.h>
#include <string.h>
#include <stdio.h>
#include <jpeglib.h>

struct shim_err {
    struct jpeg_error_mgr pub;
    jmp_buf jb;
};

static void shim_error_exit(j_common_ptr cinfo)
{
    struct shim_err *e = (struct shim_err *)cinfo->err;
    longjmp(e->jb, 1);
}

static void shim_emit_message(j_common_ptr cinfo, int msg_level)
{
    /* silence warnings: executor stderr is not a codec log */
    (void)cinfo;
    (void)msg_level;
}

/* Read (width, height, components) from the header only.
 * Returns 0 on success, -1 on parse error. */
int ddops_jpeg_header(const unsigned char *buf, size_t len,
                      int *w, int *h, int *ncomp)
{
    struct jpeg_decompress_struct cinfo;
    struct shim_err jerr;

    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = shim_error_exit;
    jerr.pub.emit_message = shim_emit_message;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, (unsigned char *)buf, (unsigned long)len);
    jpeg_read_header(&cinfo, TRUE);
    *w = (int)cinfo.image_width;
    *h = (int)cinfo.image_height;
    *ncomp = cinfo.num_components;
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

/* Decode to packed RGB24 into caller-owned `out` (capacity out_cap).
 * Returns 0 on success, -1 on decode error, -2 if out is too small.
 * Grayscale sources are converted to RGB by libjpeg; CMYK/YCCK
 * sources make it longjmp (JERR_CONVERSION_NOTIMPL) and decode
 * fails cleanly — CMYK is a documented seam. */
int ddops_jpeg_decode_rgb(const unsigned char *buf, size_t len,
                          unsigned char *out, size_t out_cap,
                          int *w, int *h)
{
    struct jpeg_decompress_struct cinfo;
    struct shim_err jerr;
    size_t stride;

    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = shim_error_exit;
    jerr.pub.emit_message = shim_emit_message;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, (unsigned char *)buf, (unsigned long)len);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    *w = (int)cinfo.output_width;
    *h = (int)cinfo.output_height;
    stride = (size_t)cinfo.output_width * (size_t)cinfo.output_components;
    if ((size_t)cinfo.output_height * stride > out_cap) {
        jpeg_destroy_decompress(&cinfo);
        return -2;
    }
    while (cinfo.output_scanline < cinfo.output_height) {
        JSAMPROW row = out + (size_t)cinfo.output_scanline * stride;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

/* Decode to packed RGB24 at a reduced DCT-domain scale: libjpeg
 * reconstructs scale_num/scale_denom of the coded size directly from
 * the frequency coefficients (scale_denom is 8; scale_num 1..16 in
 * libjpeg-turbo), so a 1/8-scale decode never materializes the full
 * pixel grid — IDCT cost and memory traffic drop with the square of
 * the scale. This is the thumbnail/resize fast path: at 100 TB of
 * page images, resizing to a model input size decodes ~1-2% of the
 * pixels the full-decode-then-resample path touches.
 * Output dims follow jpeg_calc_output_dimensions:
 * ceil(image_dim * scale_num / scale_denom). Returns 0 on success,
 * -1 on decode error, -2 if out is too small. */
int ddops_jpeg_decode_rgb_scaled(const unsigned char *buf, size_t len,
                                 int scale_num, int scale_denom,
                                 unsigned char *out, size_t out_cap,
                                 int *w, int *h)
{
    struct jpeg_decompress_struct cinfo;
    struct shim_err jerr;
    size_t stride;

    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = shim_error_exit;
    jerr.pub.emit_message = shim_emit_message;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, (unsigned char *)buf, (unsigned long)len);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    cinfo.scale_num = (unsigned int)scale_num;
    cinfo.scale_denom = (unsigned int)scale_denom;
    jpeg_start_decompress(&cinfo);
    *w = (int)cinfo.output_width;
    *h = (int)cinfo.output_height;
    stride = (size_t)cinfo.output_width * (size_t)cinfo.output_components;
    if ((size_t)cinfo.output_height * stride > out_cap) {
        jpeg_destroy_decompress(&cinfo);
        return -2;
    }
    while (cinfo.output_scanline < cinfo.output_height) {
        JSAMPROW row = out + (size_t)cinfo.output_scanline * stride;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

/* ABI probe: native/__init__.py recompiles a stale .so whose version
 * predates the symbols it needs (the loader also accepts a shipped .so
 * missing only optional symbols, degrading that capability). Bump when
 * exported signatures change. */
int ddops_abi_version(void)
{
    return 3;
}

/* Encode packed RGB24 -> baseline JPEG. h_samp/v_samp set the luma
 * sampling factors (2,2 = 4:2:0, 2,1 = 4:2:2, 1,1 = 4:4:4 — the same
 * three modes operators/jpeg.py emits). `progressive` nonzero emits a
 * progressive scan script (jpeg_simple_progression) — same DCT
 * coefficients reordered across scans, so it decodes bit-identically to
 * the baseline encoding; the pure-numpy decoder documents progressive
 * as a NotImplementedError seam and this is the path that closes it.
 * The output buffer is allocated by jpeg_mem_dest; the caller copies it
 * out and calls ddops_free. Returns 0 on success, -1 on error. */
static int encode_rgb_impl(const unsigned char *rgb, int w, int h,
                           int quality, int h_samp, int v_samp,
                           int progressive,
                           unsigned char **outbuf, unsigned long *outlen)
{
    struct jpeg_compress_struct cinfo;
    struct shim_err jerr;
    size_t stride = (size_t)w * 3;

    *outbuf = NULL;
    *outlen = 0;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = shim_error_exit;
    jerr.pub.emit_message = shim_emit_message;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_compress(&cinfo);
        if (*outbuf) {
            free(*outbuf);
            *outbuf = NULL;
        }
        return -1;
    }
    jpeg_create_compress(&cinfo);
    jpeg_mem_dest(&cinfo, outbuf, outlen);
    cinfo.image_width = (JDIMENSION)w;
    cinfo.image_height = (JDIMENSION)h;
    cinfo.input_components = 3;
    cinfo.in_color_space = JCS_RGB;
    jpeg_set_defaults(&cinfo);
    jpeg_set_quality(&cinfo, quality, TRUE);
    cinfo.comp_info[0].h_samp_factor = h_samp;
    cinfo.comp_info[0].v_samp_factor = v_samp;
    cinfo.comp_info[1].h_samp_factor = 1;
    cinfo.comp_info[1].v_samp_factor = 1;
    cinfo.comp_info[2].h_samp_factor = 1;
    cinfo.comp_info[2].v_samp_factor = 1;
    if (progressive)
        jpeg_simple_progression(&cinfo);
    jpeg_start_compress(&cinfo, TRUE);
    while (cinfo.next_scanline < cinfo.image_height) {
        JSAMPROW row = (JSAMPROW)(rgb + (size_t)cinfo.next_scanline * stride);
        jpeg_write_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_compress(&cinfo);
    jpeg_destroy_compress(&cinfo);
    return 0;
}

int ddops_jpeg_encode_rgb(const unsigned char *rgb, int w, int h,
                          int quality, int h_samp, int v_samp,
                          unsigned char **outbuf, unsigned long *outlen)
{
    return encode_rgb_impl(rgb, w, h, quality, h_samp, v_samp, 0,
                           outbuf, outlen);
}

int ddops_jpeg_encode_rgb_prog(const unsigned char *rgb, int w, int h,
                               int quality, int h_samp, int v_samp,
                               unsigned char **outbuf, unsigned long *outlen)
{
    return encode_rgb_impl(rgb, w, h, quality, h_samp, v_samp, 1,
                           outbuf, outlen);
}

void ddops_free(void *p)
{
    free(p);
}
