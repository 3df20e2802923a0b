/* Differential-test shim: expose the system libjpeg(-turbo) and libpng
 * decoders through a flat C ABI so the pure-Python media tiers can be
 * verified against the reference implementations via ctypes.
 * Built on demand by the test suite (skipped when gcc/headers are
 * absent); never part of the shipped package. */
#include <stdio.h>
#include <setjmp.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>
#include <png.h>

struct shim_err { struct jpeg_error_mgr pub; jmp_buf jb; };

static void shim_error_exit(j_common_ptr cinfo) {
    struct shim_err *e = (struct shim_err *)cinfo->err;
    longjmp(e->jb, 1);
}

/* Decode a JPEG to 8-bit samples (RGB or grayscale). Returns 0 on
 * success; *out is malloc'd (w*h*channels), freed via shim_free.
 * fancy: libjpeg do_fancy_upsampling flag. */
int shim_jpeg_decode(const unsigned char *data, unsigned long len,
                     int fancy, int *w, int *h, int *channels,
                     unsigned char **out) {
    struct jpeg_decompress_struct cinfo;
    struct shim_err jerr;
    unsigned char *buf = NULL;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = shim_error_exit;
    if (setjmp(jerr.jb)) {
        free(buf);
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, (unsigned char *)data, len);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.dct_method = JDCT_ISLOW;
    cinfo.do_fancy_upsampling = fancy ? TRUE : FALSE;
    jpeg_start_decompress(&cinfo);
    *w = (int)cinfo.output_width;
    *h = (int)cinfo.output_height;
    *channels = cinfo.output_components;
    {
        size_t stride = (size_t)cinfo.output_width * cinfo.output_components;
        buf = malloc(stride * cinfo.output_height);
        if (!buf) longjmp(jerr.jb, 1);
        while (cinfo.output_scanline < cinfo.output_height) {
            unsigned char *row = buf + stride * cinfo.output_scanline;
            jpeg_read_scanlines(&cinfo, &row, 1);
        }
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    *out = buf;
    return 0;
}

/* Decode a PNG to 8-bit RGBA. Returns 0 on success. */
int shim_png_decode(const unsigned char *data, size_t len,
                    int *w, int *h, unsigned char **out) {
    png_image image;
    memset(&image, 0, sizeof image);
    image.version = PNG_IMAGE_VERSION;
    if (!png_image_begin_read_from_memory(&image, data, len)) return 1;
    image.format = PNG_FORMAT_RGBA;
    *out = malloc(PNG_IMAGE_SIZE(image));
    if (!*out) { png_image_free(&image); return 1; }
    if (!png_image_finish_read(&image, NULL, *out, 0, NULL)) {
        free(*out);
        return 1;
    }
    *w = (int)image.width;
    *h = (int)image.height;
    return 0;
}

void shim_free(void *p) { free(p); }

/* Encode 8-bit RGB through the system libjpeg (quality q, optional
 * progressive / 4:2:0) so the pure-Python decoder can be tested on
 * real foreign streams (optimized tables, libjpeg quant choices). */
int shim_jpeg_encode(const unsigned char *rgb, int w, int h, int quality,
                     int progressive, int subsample420,
                     unsigned char **out, unsigned long *outlen) {
    struct jpeg_compress_struct cinfo;
    struct shim_err jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = shim_error_exit;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_compress(&cinfo);
        return 1;
    }
    jpeg_create_compress(&cinfo);
    *out = NULL;
    *outlen = 0;
    jpeg_mem_dest(&cinfo, out, outlen);
    cinfo.image_width = w;
    cinfo.image_height = h;
    cinfo.input_components = 3;
    cinfo.in_color_space = JCS_RGB;
    jpeg_set_defaults(&cinfo);
    jpeg_set_quality(&cinfo, quality, TRUE);
    if (progressive) jpeg_simple_progression(&cinfo);
    if (!subsample420) {
        int i;
        for (i = 0; i < cinfo.num_components; i++) {
            cinfo.comp_info[i].h_samp_factor = 1;
            cinfo.comp_info[i].v_samp_factor = 1;
        }
    }
    jpeg_start_compress(&cinfo, TRUE);
    while (cinfo.next_scanline < cinfo.image_height) {
        JSAMPROW row = (JSAMPROW)(rgb + (size_t)cinfo.next_scanline * w * 3);
        jpeg_write_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_compress(&cinfo);
    jpeg_destroy_compress(&cinfo);
    return 0;
}

/* Encode 8-bit RGBA through the system libpng (its own filter
 * heuristics) for foreign-stream decode tests. */
int shim_png_encode(const unsigned char *rgba, int w, int h,
                    unsigned char **out, size_t *outlen) {
    png_image image;
    memset(&image, 0, sizeof image);
    image.version = PNG_IMAGE_VERSION;
    image.width = w;
    image.height = h;
    image.format = PNG_FORMAT_RGBA;
    *outlen = PNG_IMAGE_PNG_SIZE_MAX(image);
    *out = malloc(*outlen);
    if (!*out) return 1;
    if (!png_image_write_to_memory(&image, *out, outlen, 0, rgba, 0,
                                   NULL)) {
        free(*out);
        return 1;
    }
    return 0;
}
